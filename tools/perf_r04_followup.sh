#!/bin/bash
# r4 follow-up TPU experiments (sequential; single-client tunnel).
set -u
cd "$(dirname "$0")/.."
LOG=outputs/perf_r04.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run "bench-window576-postfix" python -u bench.py --window576
run "bench-mlp-xla-ab"        env ACTALKER_MLP=xla python -u bench.py
run "bench-gather"            python -u bench.py --gather
run "bench-ssm-seam-arranged" env ACTALKER_SSM_SEAM=arranged python -u bench.py
echo "FOLLOWUP DONE $(date -u +%H:%M:%S)" >> "$LOG"
run "bench-train-retry"       env ACTALKER_BENCH_WAIT_S=900 timeout 4800 python -u bench.py --train
echo "FOLLOWUP2 DONE $(date -u +%H:%M:%S)" >> "$LOG"
