#!/bin/bash
# Round-5c window: bf16 WITH the composed tail (the r5b bf16 rows ran
# compose-OFF — bench_components overrides the new default unless the flag
# is passed), closing VERDICT r4 item 6 with same-window f32/bf16 pairs.
set -u
cd /root/repo
LOG=/tmp/r5c_measure.log
: > "$LOG"
stamp() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >> "$LOG"; }

stamp "bf16 raw fold+compose"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold --fpn-compose --dtype bfloat16 >> "$LOG" 2>&1

stamp "f32 raw fold+compose (same-window pair)"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold --fpn-compose >> "$LOG" 2>&1

stamp "bf16 mid fold+compose"
timeout 2400 python scripts/bench_components.py 512 640 5 --fold --fpn-compose --dtype bfloat16 >> "$LOG" 2>&1

stamp "done"
