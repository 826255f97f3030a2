#!/bin/bash
# Poll the axon TPU tunnel with a D2H round-trip probe; when healthy,
# suspend the given host-side build's WHOLE PROCESS GROUP (1-core box —
# any concurrent host process corrupts bench numbers, CLAUDE.md), run
# the round-5 capture list, and resume the build after.
#
# PGID handling (round-4 advisor): the group is looked up with
# `ps -o pgid=` instead of assuming the PID is a setsid leader — if the
# build was launched without setsid, the fallback used to leave child
# python stages running through the capture window.
# Usage: bash scripts/tpu_watch_r5.sh [max_wait_seconds] [build_pid]
set -u
cd "$(dirname "$0")/.."
MAX="${1:-14400}"
BUILD_PID="${2:-}"
LOG=/tmp/lrm_tpu_watch_r5.log
START=$(date +%s)
echo "=== watch r5 start $(date) build_pid=${BUILD_PID:-none} ===" >> "$LOG"

_signal_build() {  # _signal_build STOP|CONT
  [ -n "$BUILD_PID" ] && kill -0 "$BUILD_PID" 2>/dev/null || return 0
  local pgid
  pgid=$(ps -o pgid= -p "$BUILD_PID" | tr -d ' ')
  if [ -n "$pgid" ] && [ "$pgid" != "$$" ]; then
    kill "-$1" -- "-$pgid" 2>/dev/null \
      && echo "build pgid $pgid $1" >> "$LOG" && return 0
  fi
  kill "-$1" "$BUILD_PID" 2>/dev/null \
    && echo "build pid $BUILD_PID $1 (no group)" >> "$LOG"
}

while :; do
  if timeout 150 python -c "
import time, jax, numpy as np
assert jax.devices()[0].platform != 'cpu'
x = jax.jit(lambda a: a @ a)(jax.device_put(np.ones((64, 64), np.float32)))
t0 = time.time(); np.asarray(x); dt = time.time() - t0
print(f'D2H probe {dt:.2f}s')
assert dt < 20, f'link degraded: D2H {dt:.1f}s'
" >> "$LOG" 2>&1; then
    echo "=== TPU HEALTHY $(date) — starting runlist r5 ===" >> "$LOG"
    _signal_build STOP
    bash scripts/tpu_runlist_r5.sh
    _signal_build CONT
    echo "=== runlist r5 finished $(date) ===" >> "$LOG"
    exit 0
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX" ]; then
    echo "=== watch gave up after ${MAX}s $(date) ===" >> "$LOG"
    exit 1
  fi
  sleep 240
done
