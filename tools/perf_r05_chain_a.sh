#!/bin/bash
# Round-5 perf chain A (sequential TPU jobs — the tunnel is single-client):
#  1. baseline step bench after the r5 ADVICE fixes (cache-hit expected)
#  2. MHA block-size sweep + padded-flash-bwd check (new kernel gate)
#  3. GroupNorm stats/producer-fission A/B (ACTALKER_GN_BARRIER=1)
cd /root/repo || exit 1
mkdir -p outputs
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) baseline step bench (r5 start) ==="
  timeout 2400 python -u bench.py
  echo "=== $(date -u +%H:%M:%S) sweep_mha (blocks + padded bwd) ==="
  timeout 5400 python -u tools/sweep_mha.py
  echo "=== $(date -u +%H:%M:%S) GN barrier A/B step bench ==="
  ACTALKER_GN_BARRIER=1 timeout 2400 python -u bench.py
  echo "=== $(date -u +%H:%M:%S) chain A done ==="
} >> "$LOG" 2>&1
