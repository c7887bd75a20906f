#!/usr/bin/env bash
# Real-data drill: released torch checkpoint -> depth maps -> fused clouds ->
# DTU metric, in ONE command.  This is the first action when DTU data / the
# released MVSTER checkpoint become available (round-1 verdict item #1); the
# synthetic rehearsal of this exact chain is scripts/smoke_drill.py.
#
# Usage:
#   bash scripts/real_data_drill.sh TORCH_CKPT DTU_TEST_DIR DTU_GT_DIR [OUTDIR]
#
#   TORCH_CKPT    the reference's released .ckpt (torch.save dict with 'model')
#   DTU_TEST_DIR  Yao-preprocessed DTU test set (scanN/{images,cams,pair.txt})
#   DTU_GT_DIR    SampleSet "MVS Data" dir (Points/stl + ObsMask)
#
# Expected result vs the reference (README.md:80): Overall <= 0.313 mm (mid).
set -eu

CKPT=$1
TESTPATH=$2
GTDIR=$3
OUTDIR=${4:-./outputs/real_drill}

mkdir -p "$OUTDIR"

python -m mvster_tpu.tools.convert_torch_ckpt "$CKPT" "$OUTDIR/weights.msgpack"

python -m mvster_tpu.tools.test \
  --dataset general_eval --testpath "$TESTPATH" --testlist lists/dtu/test.txt \
  --loadckpt "$OUTDIR/weights.msgpack" --interval_scale 1.06 \
  --outdir "$OUTDIR" --thres_view 4 --conf 0.5 \
  --group_cor --attn_temp 2 --inverse_depth \
  --dtu_gt_dir "$GTDIR" "${@:5}"

echo "=== DTU metrics ==="
cat "$OUTDIR/dtu_metrics.json"
