#!/bin/bash
# Round-4 TPU capture list — the runs still open after the round-3/-4
# resolutions (scripts/RUNLIST_DECISIONS.md): headline at the hlen-14
# default, the Pallas-dirs e2e pass, chunk 4096, the hlen-14 stage
# profile, and the full 500 Mb genome bench (full + slim HBM layouts).
# Sequential — the tunnel serves ONE process.  Each step has its own
# timeout; failures don't stop the list.
#
# Usage: bash scripts/tpu_runlist_r4.sh [logfile]
# NOTE: suspend any host-side index build first (1-core box, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/lrm_tpu_runlist_r4.log}"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_cc"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export BENCH_CACHE=1

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- [$(date +%H:%M:%S)] $name exit=$?" >> "$LOG"
}

echo "=== runlist r4 start $(date) ===" >> "$LOG"

# 0. tunnel probe incl. a D2H round trip (the 2026-08-19 degradation mode
# passed `jax.devices()` but stalled multi-minute on any D2H fetch).
PROBE=$(mktemp)
timeout 180 python -c "
import time, jax, numpy as np
print(jax.devices())
x = jax.jit(lambda a: a @ a)(jax.device_put(np.ones((64, 64), np.float32)))
t0 = time.time(); np.asarray(x)
print(f'D2H probe {time.time() - t0:.2f}s')
" > "$PROBE" 2>&1
cat "$PROBE" >> "$LOG"
grep -qi "D2H probe" "$PROBE" || { echo "NO TPU / dead link — abort" >> "$LOG"; rm -f "$PROBE"; exit 1; }
rm -f "$PROBE"

# 1. headline bench at the hlen-14 default (per-config artifact cache)
run bench 2400 python bench.py

# 2. Pallas band-DP kernel in the full step (standalone A/B was 1.16x;
# this decides whether LRM_PALLAS_DIRS graduates to the TPU default)
run bench_pallas 2400 env LRM_PALLAS_DIRS=1 PASSES=3 python bench.py

# 3. dispatch-latency amortization: one bigger chunk bucket
run bench_b4096 2400 env CHUNK_B=4096 PASSES=3 python bench.py

# 3b. forced 64-slot compact budget at hlen 14 (computed budget is 80;
# simulated phase max is 58 — 64 holds it with the retry tier as the
# exactness guarantee; decides whether the mean+16 headroom is money)
run bench_v64 2400 env LRM_VOTE_SLOTS=64 PASSES=3 python bench.py

# 4. per-stage device profile at the hlen-14 default (seed_vote at the
# 80-slot budget; c-walk traceback timings with realistic targets)
run profile 2400 env B=2048 RL=1000 HLEN=14 \
    PROF_CACHE=/tmp/lrm_bench_cache_g4_h14 python scripts/profile_map.py

# 5. the full 500 Mb genome on the chip (VERDICT r2 #3 at full size;
# round 3 fit only the 250 Mb build into its wall clock)
run big_full 7200 python scripts/bench_big.py --dir /tmp/lrm_big500 \
    --n-reads 100000 --chunk-b 2048

# 6. slim HBM layout at 500 Mb (the measured HBM-compression trade,
# VERDICT r2 missing #5)
run big_slim 7200 python scripts/bench_big.py --dir /tmp/lrm_big500 \
    --n-reads 100000 --chunk-b 2048 --slim

echo "=== runlist r4 done $(date) ===" >> "$LOG"
