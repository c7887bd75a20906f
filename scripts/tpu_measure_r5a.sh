#!/bin/bash
# Round-5a measurement window: SCAN_R=8 kernel map + FPN composed-tail A/B.
# One process at a time on the chip; all rows chained protocol.
set -u
cd /root/repo
LOG=/tmp/r5a_measure.log
: > "$LOG"
stamp() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >> "$LOG"; }

stamp "raw f32 fold (SCAN_R=8 kernel, compose OFF)"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold >> "$LOG" 2>&1

stamp "raw f32 fold --fpn-compose"
timeout 2400 python scripts/bench_components.py 1152 1600 5 --fold --fpn-compose >> "$LOG" 2>&1

stamp "mid f32 fold (SCAN_R=8 kernel, compose OFF)"
timeout 2400 python scripts/bench_components.py 512 640 5 --fold >> "$LOG" 2>&1

stamp "mid f32 fold --fpn-compose"
timeout 2400 python scripts/bench_components.py 512 640 5 --fold --fpn-compose >> "$LOG" 2>&1

stamp "done"
