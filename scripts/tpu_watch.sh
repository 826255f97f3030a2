#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the round-3 capture list.
# The probe is timeboxed (a down tunnel hangs `import jax` indefinitely).
# Usage: bash scripts/tpu_watch.sh [max_wait_seconds]
set -u
cd "$(dirname "$0")/.."
MAX="${1:-39600}"   # default: keep watching for 11 h
LOG=/tmp/lrm_tpu_watch.log
START=$(date +%s)
echo "=== watch start $(date) ===" >> "$LOG"
while :; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "=== TPU UP $(date) — starting runlist ===" >> "$LOG"
    bash scripts/tpu_runlist.sh
    echo "=== runlist finished $(date) ===" >> "$LOG"
    exit 0
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX" ]; then
    echo "=== watch gave up after ${MAX}s $(date) ===" >> "$LOG"
    exit 1
  fi
  sleep 300
done
