#!/bin/bash
# Round-5 chain G: clip576 with the HBM trims (40f buffer, dropped frontend
# params, freed pose pixels) + the subprocess-ladder traingrad (chain E's
# E3 entry was appended after bash had read past it and never ran).
cd /root/repo || exit 1
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) G1 clip576 (40f buffer + param/pose trims) ==="
  timeout 7200 python -u bench.py --clip576
  echo "=== $(date -u +%H:%M:%S) G2 traingrad (subprocess ladder) ==="
  timeout 7200 python -u bench.py --traingrad
  echo "=== $(date -u +%H:%M:%S) chain G done ==="
} >> "$LOG" 2>&1
