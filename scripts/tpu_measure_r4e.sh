#!/bin/bash
# Round-4 measurement, take 5: the POST-routing component maps — einsum/
# stencil upsample routing by _STENCIL2X_MIN_PIXELS, packed-coords cost
# volume default, polyphase transpose convs by _POLYPHASE_MIN_PIXELS, and
# the Pallas up kernel deleted.  These are the maps BENCH_r04's headline
# must reconcile against.  ONE TPU process at a time; kill only by the
# PID file.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== component map, mid f32 (final r4 routing) ==="
  timeout 1800 python scripts/bench_components.py 512 640
  echo "=== component map, raw f32 (final r4 routing) ==="
  timeout 2400 python scripts/bench_components.py 1152 1600
  echo "=== component map, raw bf16 (final r4 routing) ==="
  timeout 2400 python scripts/bench_components.py 1152 1600 --dtype bfloat16
  echo "=== FPN layer map: fused-tail rows at 2 views (post-OOM-fix) ==="
  timeout 1800 python scripts/probe_fpn_layers.py
} 2>&1 | tee /tmp/r4e_measure.log
