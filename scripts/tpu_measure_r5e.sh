#!/bin/bash
# Round-5e window (serial, one TPU process at a time):
#   1. isolated scatter backward per stage, band-matmul branch ON (default)
#   2. same, band-matmul disabled (--band-rows 0) — the A/B for the branch
#   3. full backward decomposition incl. the new R7 "sg warp" row
#      (separates scatter bwd + FPN-via-cv from the correlation bwd)
set -u
cd /root/repo
LOG=/tmp/r5e_measure.log
: > "$LOG"
stamp() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >> "$LOG"; }

stamp "probe_scatter mid b2 (band-matmul ON)"
timeout 1800 python scripts/probe_scatter.py 512 640 5 >> "$LOG" 2>&1

stamp "probe_scatter mid b2 (band-matmul OFF)"
timeout 1800 python scripts/probe_scatter.py 512 640 5 --band-rows 0 >> "$LOG" 2>&1

stamp "probe_train_bwd mid b2 (new kernel + R7)"
timeout 3600 python scripts/probe_train_bwd.py >> "$LOG" 2>&1

stamp "done"
