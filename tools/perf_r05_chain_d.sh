#!/bin/bash
# Round-5 chain D: reruns with the constant-capture fixes + traingrad ladder.
# C2 traingrad OOM'd at 8f/512px (ladder added), C3 clip576 OOM'd on the
# decode params-as-constants bug (fixed in pipeline.py), C4 serve was killed
# mid-lowering of 3.46 GB of baked constants (fixed in serving.py).
cd /root/repo || exit 1
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) D1 clip576 (decode constant-capture fixed) ==="
  timeout 7200 python -u bench.py --clip576
  echo "=== $(date -u +%H:%M:%S) D2 serve (params-as-arg fixed) ==="
  timeout 7200 python -u bench.py --serve
  echo "=== $(date -u +%H:%M:%S) D3 traingrad (shape ladder) ==="
  timeout 7200 python -u bench.py --traingrad
  echo "=== $(date -u +%H:%M:%S) chain D done ==="
} >> "$LOG" 2>&1
