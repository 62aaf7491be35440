#!/bin/bash
# Round-5 chain E: profile + tune the 576px production shape (VERDICT r4
# task #5) once the measurement chains C/D are done.
cd /root/repo || exit 1
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) E0 clip576 retry (sampler/decode workspace fence) ==="
  timeout 7200 python -u bench.py --clip576
  echo "=== $(date -u +%H:%M:%S) E0a longform retry (C5 hit a TPU-worker crash at readback) ==="
  timeout 7200 python -u tools/run_longform.py
  echo "=== $(date -u +%H:%M:%S) E0c serve retry (identity-count ladder) ==="
  timeout 7200 python -u bench.py --serve
  echo "=== $(date -u +%H:%M:%S) E0b loader retry (chunked VAE encode fix) ==="
  timeout 3600 python -u tools/loader_throughput.py
  echo "=== $(date -u +%H:%M:%S) E1 mha block sweep at 576 shape ==="
  timeout 3600 python -u tools/sweep_mha.py --s576
  echo "=== $(date -u +%H:%M:%S) E2 step profile --prod (576px/25f) ==="
  timeout 3600 python -u tools/step_profile.py 40 --prod
  timeout 3600 python -u tools/dump_step_hlo.py --prod
  timeout 900 python tools/attribute_step.py 3 --prod
  echo "=== $(date -u +%H:%M:%S) E3 traingrad retry (subprocess ladder) ==="
  timeout 7200 python -u bench.py --traingrad
  echo "=== $(date -u +%H:%M:%S) chain E done ==="
} >> "$LOG" 2>&1
