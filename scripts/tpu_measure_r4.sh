#!/bin/bash
# Round-4 TPU measurement sequence: run serially (one process at a time —
# concurrent TPU processes serialize through the tunnel and poison
# timings, CLAUDE.md).  Results land in /tmp/r4_measure.log.
#
# Order: correctness smoke first, then the component maps whose sums must
# reconcile with bench.py's headline, then the rp sweep that places
# kernels/pallas_warp._row_pack's thresholds, then the s2d adjudication
# (in-model A/B + production-pair conv probes), then the headline.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== smoke_forward mid (correctness + on-chip warp parity) ==="
  timeout 1200 python scripts/smoke_forward.py 512 640 5
  echo "=== component map, raw f32 ==="
  timeout 2400 python scripts/bench_components.py 1152 1600
  echo "=== component map, mid f32 ==="
  timeout 1800 python scripts/bench_components.py 512 640
  echo "=== component map raw bf16 ==="
  timeout 1800 python scripts/bench_components.py 1152 1600 --dtype bfloat16
  echo "=== FPN per-layer map at raw (places the conv-cliff attack) ==="
  timeout 1800 python scripts/probe_fpn_layers.py
  echo "=== s2d in-model A/B at raw (adjudicates nn/s2d.py routing) ==="
  timeout 1800 python scripts/probe_s2d_model.py
  echo "=== conv-efficiency sweep incl. production reg2d pair ==="
  timeout 1800 python scripts/probe_conv_eff.py
  echo "=== headline bench.py ==="
  timeout 2400 python bench.py
} 2>&1 | tee /tmp/r4_measure.log
