#!/bin/bash
# Round-4 measurement, take 4: adjudicates the fused packed-space cost
# volume (probe_cv_glue's G row vs A), attributes reg2d stage4 incl. the
# transpose-conv polyphase A/B, tests the FPN fusion-barrier hypothesis,
# and re-maps mid with the v2 stencil ups.  ONE TPU process at a time;
# kill only by the PID file.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== cost-volume glue + packed A/B, raw stage4 ==="
  timeout 2400 python scripts/probe_cv_glue.py 1152 1600 --stage 4
  echo "=== cost-volume glue + packed A/B, mid stage4 ==="
  timeout 1800 python scripts/probe_cv_glue.py 512 640 --stage 4
  echo "=== cost-volume packed A/B, raw stage3 ==="
  timeout 1800 python scripts/probe_cv_glue.py 1152 1600 --stage 3
  echo "=== reg2d per-layer map + transpose-conv polyphase A/B, raw ==="
  timeout 1800 python scripts/probe_reg_layers.py
  echo "=== FPN layer map: barrier experiment + bandwidth anchor ==="
  timeout 1800 python scripts/probe_fpn_layers.py
  echo "=== upsample A/B: einsum vs stencil orders vs pallas lane kernel ==="
  timeout 1800 python scripts/probe_up.py
  echo "=== component map, mid f32 (pallas up kernel routed) ==="
  timeout 1800 python scripts/bench_components.py 512 640
  echo "=== component map, raw f32 (pallas up kernel routed) ==="
  timeout 2400 python scripts/bench_components.py 1152 1600
} 2>&1 | tee /tmp/r4d_measure.log
