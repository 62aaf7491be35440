#!/bin/bash
# Round-5 chain F: final retries with the encoder-side workspace fence
# (pipeline.py generate_latents) + windows_per_call=1 longform.
cd /root/repo || exit 1
LOG=outputs/perf_r05.log
{
  echo "=== $(date -u +%H:%M:%S) F1 clip576 retry 2 (encoder fence) ==="
  timeout 7200 python -u bench.py --clip576
  echo "=== $(date -u +%H:%M:%S) F2 longform retry 2 (wpc=1 + fences) ==="
  timeout 7200 python -u tools/run_longform.py
  echo "=== $(date -u +%H:%M:%S) F3 clip 512 re-measure (fences active) ==="
  timeout 3600 python -u bench.py --clip
  echo "=== $(date -u +%H:%M:%S) F5 window576 re-measure (bq=256 picker) ==="
  timeout 3600 python -u bench.py --window576
  echo "=== $(date -u +%H:%M:%S) F4 loader at 8 workers ==="
  timeout 3600 python -u tools/loader_throughput.py --workers 8
  echo "=== $(date -u +%H:%M:%S) chain F done ==="
} >> "$LOG" 2>&1
