#!/bin/bash
# Round-4 measurement, take 3.  Takes 1+2 double-booked the chip (the
# first session's suite survived its parent and overlapped the relaunch
# from 02:58, poisoning everything after — negative/absurd component
# rows).  Clean results already in hand from the solo window 01:55-02:58:
# raw f32 533.3 ms map, raw bf16 504.7 ms map, FPN layer map incl.
# out4 23.9 ms + einsum ups 62 ms, s2d in-model A/B (loses 2x).
# This run: the mid map, the POST-STENCIL FPN layer map, the cost-volume
# glue decomposition, and the headline.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== component map, mid f32 ==="
  timeout 1800 python scripts/bench_components.py 512 640
  echo "=== FPN per-layer map at raw (post-stencil-upsample) ==="
  timeout 1800 python scripts/probe_fpn_layers.py
  echo "=== cost-volume glue decomposition, raw stage4 ==="
  timeout 2400 python scripts/probe_cv_glue.py 1152 1600 --stage 4
  echo "=== cost-volume glue decomposition, mid stage4 ==="
  timeout 1800 python scripts/probe_cv_glue.py 512 640 --stage 4
  echo "=== headline bench.py ==="
  timeout 2400 python bench.py
} 2>&1 | tee /tmp/r4c_measure.log
