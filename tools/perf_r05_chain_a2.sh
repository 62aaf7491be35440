#!/bin/bash
# Round-5 perf chain A2: disentangle the GN-barrier vs new-mha step deltas,
# finish the (hardened) block sweep + padded-bwd check, and capture a fresh
# xprof attribution of the r5 step.
cd /root/repo || exit 1
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) A2.1 step bench: new mha alone (GN barrier off) ==="
  timeout 2400 python -u bench.py
  echo "=== $(date -u +%H:%M:%S) A2.2 sweep_mha hardened (3 shapes + bwd5184) ==="
  timeout 5400 python -u tools/sweep_mha.py
  echo "=== $(date -u +%H:%M:%S) A2.3 step profile (r5 kernels) ==="
  timeout 2400 python -u tools/step_profile.py 40
  timeout 1800 python -u tools/dump_step_hlo.py
  timeout 900 python tools/attribute_step.py 3
  echo "=== $(date -u +%H:%M:%S) chain A2 done ==="
} >> "$LOG" 2>&1
