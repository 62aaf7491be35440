#!/bin/bash
# Sequential TPU perf experiments (single-client tunnel: one process at a
# time). Appends one line per experiment to outputs/perf_r02.log.
# Usage: bash tools/perf_run.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs
LOG=outputs/perf_r02.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run "bench-baseline"      python -u bench.py
run "bench-normstats-matmul" env ACTALKER_NORM_STATS=matmul python -u bench.py
run "bench-clip"          python -u bench.py --clip
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
