#!/bin/bash
# Round-5b window: verify smoke (fold + SCAN_R=8 + compose default pending),
# bf16 settle rows (VERDICT r4 item 6, one clean window), train-step probe
# (item 7), trilinear-up A/B (ADVICE r4 #2), and the repaired train-step
# bench extras (item 4).
set -u
cd /root/repo
LOG=/tmp/r5b_measure.log
: > "$LOG"
stamp() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >> "$LOG"; }

stamp "smoke_forward 512 640 5 (verify surface)"
timeout 1200 python scripts/smoke_forward.py >> "$LOG" 2>&1

stamp "bf16 raw fold (one-window bf16-vs-f32 settle; f32 rows are in r5a)"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold --dtype bfloat16 >> "$LOG" 2>&1

stamp "bf16 mid fold"
timeout 2400 python scripts/bench_components.py 512 640 5 --fold --dtype bfloat16 >> "$LOG" 2>&1

stamp "train-step decomposition probe (VERDICT item 7)"
timeout 2400 python scripts/probe_train_step.py >> "$LOG" 2>&1

stamp "trilinear hypo-upsample A/B (ADVICE #2)"
timeout 1200 python scripts/probe_tri_up.py >> "$LOG" 2>&1

stamp "repaired train-step extras b1/b4 (VERDICT item 4)"
timeout 2400 python - >> "$LOG" 2>&1 << 'EOF'
import sys
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import bench
for bs, ga in [(1, 1), (4, 1)]:
    try:
        ms = bench.bench_train_step_threaded(bs, ga) * 1e3
        print(f"train_step_threaded b{bs} accum{ga}: {ms:.1f} ms")
    except Exception as e:
        print(f"train_step_threaded b{bs} accum{ga}: ERROR {e!r:.300}")
EOF

stamp "done"
