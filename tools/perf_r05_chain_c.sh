#!/bin/bash
# Round-5 measurement chain C: chain B reordered so the VERDICT-demanded
# firsts (on-chip traingrad, clip576 e2e, serving, longform) land before
# the re-measurements, in case the session runs out of wall-clock.
cd /root/repo || exit 1
mkdir -p outputs
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) C1 step bench (r5 kernel defaults) ==="
  timeout 2400 python -u bench.py
  echo "=== $(date -u +%H:%M:%S) C2 traingrad (first on-chip fwd+bwd) ==="
  timeout 5400 python -u bench.py --traingrad
  echo "=== $(date -u +%H:%M:%S) C3 clip576 (reference default shape e2e) ==="
  timeout 7200 python -u bench.py --clip576
  echo "=== $(date -u +%H:%M:%S) C4 serve (4-identity batch) ==="
  timeout 7200 python -u bench.py --serve
  echo "=== $(date -u +%H:%M:%S) C5 longform CLI 125f ==="
  timeout 7200 python -u tools/run_longform.py
  echo "=== $(date -u +%H:%M:%S) C6 clip 512/14f ==="
  timeout 3600 python -u bench.py --clip
  echo "=== $(date -u +%H:%M:%S) C7 window576 (r5 defaults) ==="
  timeout 3600 python -u bench.py --window576
  echo "=== $(date -u +%H:%M:%S) C8 loader throughput ==="
  timeout 3600 python -u tools/loader_throughput.py
  echo "=== $(date -u +%H:%M:%S) C9 gather A/B (r5 defaults) ==="
  timeout 3600 python -u bench.py --gather
  echo "=== $(date -u +%H:%M:%S) C10 train (full-Adam structured outcome) ==="
  timeout 3600 python -u bench.py --train
  echo "=== $(date -u +%H:%M:%S) chain C done ==="
} >> "$LOG" 2>&1
