#!/usr/bin/env bash
# DTU training preset (the published config, reference scripts/train_dtu.sh).
# Usage: bash scripts/train_dtu.sh {mid|raw} EXP_NAME [extra flags...]
set -eu

DTU_TRAINING=${DTU_TRAINING:-/data/mvs_training/dtu}
TRAINLIST=lists/dtu/train.txt
TESTLIST=lists/dtu/val.txt

SIZE=$1
EXP=$2
shift 2

LOGDIR=./checkpoints/dtu/$EXP
mkdir -p "$LOGDIR"

EXTRA=""
if [ "$SIZE" = "raw" ]; then
  EXTRA="--use_raw_train"
fi

# one SPMD program: the global batch shards over every visible chip
python -m mvster_tpu.tools.train \
  --logdir "$LOGDIR" --dataset dtu --batch_size "${BATCH:-8}" \
  --trainpath "$DTU_TRAINING" --trainlist $TRAINLIST --testlist $TESTLIST \
  --summary_freq 100 --group_cor --inverse_depth --rt --mono --attn_temp 2 \
  $EXTRA "$@" | tee -a "$LOGDIR/log.txt"
