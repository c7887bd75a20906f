#!/bin/bash
# Round-4 measurement, take 6: (a) the raw f32 post-routing map that r4e
# lost to a tunnel RPC blip, and (b) the folded-depth reg2d A/B at both
# sizes (nn/reg.py fold=...) — the measurement that decides reg2d_fold's
# default.  ONE TPU process at a time; kill only by the PID file.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== FOLD A/B: mid f32 --fold ==="
  timeout 1800 python scripts/bench_components.py 512 640 --fold
  echo "=== component map, raw f32 (final r4 routing, r4e re-run) ==="
  timeout 2400 python scripts/bench_components.py 1152 1600
  echo "=== FOLD A/B: raw f32 --fold ==="
  timeout 2400 python scripts/bench_components.py 1152 1600 --fold
  echo "=== FOLD A/B: raw bf16 --fold ==="
  timeout 2400 python scripts/bench_components.py 1152 1600 --dtype bfloat16 --fold
} 2>&1 | tee /tmp/r4f_measure.log
