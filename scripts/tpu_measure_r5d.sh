#!/bin/bash
# Round-5d window (serial, one TPU process at a time):
#   1. scan_r 8-vs-16 A/B at raw stage4 (the _scan_r shape gate's evidence)
#   2. f32 + bf16 raw fold+compose same-window pair on the FINAL kernel
#      (the r5c bf16 raw row crashed pre-fix; its f32 pair ran scan_r=8)
#   3. bf16 mid fold+compose (same-window with the pair above)
#   4. train-step backward decomposition (probe_train_bwd)
set -u
cd /root/repo
LOG=/tmp/r5d_measure.log
: > "$LOG"
stamp() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >> "$LOG"; }

stamp "scan_r=8 raw s4 (pinned)"
timeout 1800 python scripts/probe_cv_fused.py 1152 1600 5 --scan-r 8 >> "$LOG" 2>&1

stamp "scan_r=16 raw s4 (pinned)"
timeout 1800 python scripts/probe_cv_fused.py 1152 1600 5 --scan-r 16 >> "$LOG" 2>&1

stamp "f32 raw fold+compose (final kernel)"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold --fpn-compose >> "$LOG" 2>&1

stamp "bf16 raw fold+compose (same-window pair)"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold --fpn-compose --dtype bfloat16 >> "$LOG" 2>&1

stamp "train-step backward decomposition (mid b2)"
timeout 3600 python scripts/probe_train_bwd.py >> "$LOG" 2>&1

stamp "done"
