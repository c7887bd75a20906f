#!/bin/bash
# Round-3 TPU measurement sequence: run serially (one process at a time —
# concurrent TPU processes serialize through the tunnel and poison
# timings, CLAUDE.md).  Results land in /tmp/r3_measure.log.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== smoke_forward mid (correctness + on-chip warp parity) ==="
  timeout 1200 python scripts/smoke_forward.py 512 640 5
  echo "=== smoke_forward raw ==="
  timeout 1800 python scripts/smoke_forward.py 1152 1600 5
  echo "=== component map raw f32 ==="
  timeout 1800 python scripts/bench_components.py 1152 1600
  echo "=== component map mid f32 ==="
  timeout 1200 python scripts/bench_components.py 512 640
  echo "=== component map raw bf16 ==="
  timeout 1800 python scripts/bench_components.py 1152 1600 --dtype bfloat16
  echo "=== headline bench.py ==="
  timeout 2400 python bench.py
  echo "=== conv-efficiency sweep (decides nn/s2d.py S2D_MAX_COUT 16 vs 32) ==="
  timeout 1200 python scripts/probe_conv_eff.py
} 2>&1 | tee /tmp/r3_measure.log
