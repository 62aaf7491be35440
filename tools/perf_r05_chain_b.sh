#!/bin/bash
# Round-5 measurement chain B (sequential TPU jobs, single-client tunnel).
# Run after chain A's A/Bs picked the kernel defaults.
# Usage: bash tools/perf_r05_chain_b.sh [extra env in the environment]
cd /root/repo || exit 1
mkdir -p outputs
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) B1 step bench (r5 kernel defaults) ==="
  timeout 2400 python -u bench.py
  echo "=== $(date -u +%H:%M:%S) B2 window576 (r5 defaults) ==="
  timeout 3600 python -u bench.py --window576
  echo "=== $(date -u +%H:%M:%S) B3 traingrad (first on-chip fwd+bwd) ==="
  timeout 5400 python -u bench.py --traingrad
  echo "=== $(date -u +%H:%M:%S) B4 clip576 (reference default shape e2e) ==="
  timeout 7200 python -u bench.py --clip576
  echo "=== $(date -u +%H:%M:%S) B5 clip 512/14f ==="
  timeout 3600 python -u bench.py --clip
  echo "=== $(date -u +%H:%M:%S) B6 serve (4-identity batch) ==="
  timeout 7200 python -u bench.py --serve
  echo "=== $(date -u +%H:%M:%S) B7 longform CLI 125f ==="
  timeout 7200 python -u tools/run_longform.py
  echo "=== $(date -u +%H:%M:%S) B8 loader throughput ==="
  timeout 3600 python -u tools/loader_throughput.py
  echo "=== $(date -u +%H:%M:%S) B9 gather A/B (r5 defaults) ==="
  timeout 3600 python -u bench.py --gather
  echo "=== $(date -u +%H:%M:%S) B10 train (full-Adam structured outcome) ==="
  timeout 3600 python -u bench.py --train
  echo "=== $(date -u +%H:%M:%S) chain B done ==="
} >> "$LOG" 2>&1
