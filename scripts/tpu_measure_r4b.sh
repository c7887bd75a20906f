#!/bin/bash
# Round-4 measurement continuation: the first run (/tmp/r4_measure.log)
# completed smoke, raw f32/bf16 component maps, and most of the FPN layer
# map before the VM restart killed it.  This finishes the rest, serially
# (one TPU process at a time — CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
{
  echo "=== component map, mid f32 (retry: transient remote_compile error) ==="
  timeout 1800 python scripts/bench_components.py 512 640
  echo "=== FPN per-layer map at raw (retry: truncated at out3) ==="
  timeout 1800 python scripts/probe_fpn_layers.py
  echo "=== s2d in-model A/B at raw (adjudicates nn/s2d.py routing) ==="
  timeout 1800 python scripts/probe_s2d_model.py
  echo "=== conv-efficiency sweep incl. production reg2d pair ==="
  timeout 1800 python scripts/probe_conv_eff.py
  echo "=== headline bench.py ==="
  timeout 2400 python bench.py
} 2>&1 | tee /tmp/r4b_measure.log
