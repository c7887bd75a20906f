#!/usr/bin/env bash
# DTU inference + fusion + metric preset (reference scripts/test_dtu.sh).
# Usage: bash scripts/test_dtu.sh {mid|raw} EXP_NAME [extra flags...]
set -eu

DTU_TESTPATH=${DTU_TESTPATH:-/data/dtu_test}
TESTLIST=lists/dtu/test.txt

SIZE=$1
EXP=$2
shift 2

LOGDIR=./checkpoints/dtu/$EXP
OUTDIR=./outputs/dtu/$EXP
CKPT=${CKPT:-$(ls -t "$LOGDIR"/model_*.msgpack 2>/dev/null | head -1)}
mkdir -p "$LOGDIR"

# array (not a string): word-splitting-safe for paths with spaces
EXTRA=()
if [ "$SIZE" = "raw" ]; then
  EXTRA+=(--use_raw_train)
fi
# set DTU_GT_DIR to the SampleSet "MVS Data" dir to also run the metric
if [ -n "${DTU_GT_DIR:-}" ]; then
  EXTRA+=(--dtu_gt_dir "$DTU_GT_DIR")
fi

python -m mvster_tpu.tools.test \
  --dataset general_eval --testpath "$DTU_TESTPATH" --testlist $TESTLIST \
  --loadckpt "$CKPT" --interval_scale 1.06 --outdir "$OUTDIR" \
  --thres_view 4 --conf 0.5 --group_cor --attn_temp 2 --inverse_depth \
  ${EXTRA[@]+"${EXTRA[@]}"} "$@" | tee -a "$LOGDIR/log_test.txt"
