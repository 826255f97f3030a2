#!/bin/bash
# Post-runlist captures: the steps that could not ride tpu_runlist_r5.sh
# (the bench_long10k default was killed mid-refactor; 50 kb is new).
# Usage: bash scripts/tpu_postlist_r5.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/lrm_tpu_postlist_r5.log
CAP=bench_captures/r05
mkdir -p "$CAP"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_cc"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export BENCH_CACHE=1

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" >> "$LOG"
  { echo "# $(date -u +%FT%TZ) $*";
    timeout "$tmo" "$@" 2>&1;
    echo "# exit=$?"; } | tee -a "$LOG" > "$CAP/$name.log"
  echo "--- [$(date +%H:%M:%S)] $name done" >> "$LOG"
}

# the production 10 kb default (resident-dirs + per-indel walk at half
# band) — the step killed mid-refactor during the main list
run bench_long10k 3600 env RLEN=10000 NREADS=2048 PASSES=3 python bench.py

# 50 kb: genuinely long reads through the tiled gact path (the volume
# rule keeps gact at this scale)
run bench_long50k 5400 env RLEN=50000 NREADS=256 PASSES=3 python bench.py

echo "=== postlist r5 done $(date) ===" >> "$LOG"
