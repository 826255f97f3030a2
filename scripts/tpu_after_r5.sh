#!/bin/bash
# After-runlist captures for round 5: wait for tpu_runlist_r5.sh (driven
# by tpu_watch_r5.sh) to finish, then take the remaining high-value rows
# in priority order with a hard wall-clock deadline so nothing is still
# holding the tunnel when the round's driver bench fires.
#
#   1. headline bench RE-RUN  — the runlist's own `bench` step fell to
#      the CPU backend (tunnel flapped at 11:09); the round needs a
#      committed real-TPU headline capture (VERDICT r4 next #4)
#   2. bench_long10k (resident-dirs production default — the runlist
#      copy was killed mid-refactor, exit=143)
#   3. bench_long50k — first 50 kb row (tiled gact path)
#
# Usage: setsid bash scripts/tpu_after_r5.sh <build_pid> <deadline_epoch> &
set -u
cd "$(dirname "$0")/.."
BUILD_PID="${1:-}"
DEADLINE="${2:-$(( $(date +%s) + 10800 ))}"
LOG=/tmp/lrm_tpu_after_r5.log
CAP=bench_captures/r05
mkdir -p "$CAP"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_cc"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export BENCH_CACHE=1

echo "=== after r5 start $(date) build_pid=${BUILD_PID:-none} deadline=$(date -d @"$DEADLINE" +%H:%M:%S) ===" >> "$LOG"

# 0. wait for the watcher-driven runlist to drain (WATCH_PID optional 3rd
# arg: also proceed if the watcher process itself is gone)
WATCH_PID="${3:-}"
while :; do
  if grep -q "runlist r5 finished" /tmp/lrm_tpu_watch_r5.log 2>/dev/null; then break; fi
  if [ -n "$WATCH_PID" ] && ! kill -0 "$WATCH_PID" 2>/dev/null; then
    echo "watcher pid $WATCH_PID gone — proceeding" >> "$LOG"; break
  fi
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline hit waiting for runlist" >> "$LOG"; exit 1; }
  sleep 120
done
echo "runlist drained $(date)" >> "$LOG"

_signal_build() {
  [ -n "$BUILD_PID" ] && kill -0 "$BUILD_PID" 2>/dev/null || return 0
  local pgid
  pgid=$(ps -o pgid= -p "$BUILD_PID" | tr -d ' ')
  if [ -n "$pgid" ] && [ "$pgid" != "$$" ]; then
    kill "-$1" -- "-$pgid" 2>/dev/null && echo "build pgid $pgid $1" >> "$LOG" && return 0
  fi
  kill "-$1" "$BUILD_PID" 2>/dev/null && echo "build pid $BUILD_PID $1" >> "$LOG"
}

run() {
  local name="$1" tmo="$2"; shift 2
  local now left
  now=$(date +%s); left=$(( DEADLINE - now ))
  if [ "$left" -lt 600 ]; then
    echo "skip $name — ${left}s to deadline" >> "$LOG"; return 1
  fi
  [ "$tmo" -gt "$left" ] && tmo="$left"
  echo "=== [$(date +%H:%M:%S)] $name (tmo=${tmo}s): $*" >> "$LOG"
  { echo "# $(date -u +%FT%TZ) $*";
    timeout "$tmo" "$@" 2>&1;
    echo "# exit=$?"; } | tee -a "$LOG" > "$CAP/$name.log"
  echo "--- [$(date +%H:%M:%S)] $name done" >> "$LOG"
}

_signal_build STOP
run bench_retry    2400 python bench.py
run bench_long10k  3600 env RLEN=10000 NREADS=2048 PASSES=3 python bench.py
run bench_long50k  5400 env RLEN=50000 NREADS=256 PASSES=3 python bench.py
# deliberately LEAVE the 800 Mb build suspended: it cannot finish in the
# wall clock that remains (fmi+lchash+devidx ~5500 s at 1.6e9 chars), so
# big800_slim cannot land this round either way — and a CONTed build
# would time-slice the 1-core host under the driver's end-of-round
# bench.py (CLAUDE.md).  The build resumes in a future session via
# `kill -CONT` if its /tmp survives.
echo "=== after r5 done $(date) — build left SUSPENDED ===" >> "$LOG"
