#!/bin/bash
# Poll the axon TPU tunnel with a D2H round-trip probe (the 2026-08-19
# degradation passed `jax.devices()` but stalled minutes on any fetch);
# when healthy, SIGSTOP the host-side index build (1-core box — any
# concurrent host process corrupts bench numbers, CLAUDE.md), run the
# round-4 capture list, and resume the build after.
# Usage: bash scripts/tpu_watch_r4.sh [max_wait_seconds] [build_pid]
set -u
cd "$(dirname "$0")/.."
MAX="${1:-14400}"
BUILD_PID="${2:-}"
LOG=/tmp/lrm_tpu_watch_r4.log
START=$(date +%s)
echo "=== watch r4 start $(date) build_pid=${BUILD_PID:-none} ===" >> "$LOG"
while :; do
  if timeout 150 python -c "
import time, jax, numpy as np
assert jax.devices()[0].platform != 'cpu'
x = jax.jit(lambda a: a @ a)(jax.device_put(np.ones((64, 64), np.float32)))
t0 = time.time(); np.asarray(x); dt = time.time() - t0
print(f'D2H probe {dt:.2f}s')
assert dt < 20, f'link degraded: D2H {dt:.1f}s'
" >> "$LOG" 2>&1; then
    echo "=== TPU HEALTHY $(date) — starting runlist r4 ===" >> "$LOG"
    # suspend the build's whole process GROUP (the build may be a shell
    # chaining several python stages — launch it with setsid so the PGID
    # equals the PID passed here); fall back to the single PID.
    if [ -n "$BUILD_PID" ] && kill -0 "$BUILD_PID" 2>/dev/null; then
      { kill -STOP -- "-$BUILD_PID" 2>/dev/null || kill -STOP "$BUILD_PID"; } \
        && echo "build $BUILD_PID suspended" >> "$LOG"
    fi
    bash scripts/tpu_runlist_r4.sh
    if [ -n "$BUILD_PID" ] && kill -0 "$BUILD_PID" 2>/dev/null; then
      { kill -CONT -- "-$BUILD_PID" 2>/dev/null || kill -CONT "$BUILD_PID"; } \
        && echo "build $BUILD_PID resumed" >> "$LOG"
    fi
    echo "=== runlist r4 finished $(date) ===" >> "$LOG"
    exit 0
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX" ]; then
    echo "=== watch gave up after ${MAX}s $(date) ===" >> "$LOG"
    exit 1
  fi
  sleep 240
done
