#!/bin/bash
# Round-3 TPU capture list: runs every bench that was blocked on tunnel
# recovery, sequentially (the tunnel serves ONE process), logging to
# /tmp/lrm_tpu_runlist.log.  Safe to re-run; each step has its own timeout
# and failures don't stop the list.
#
# Usage: bash scripts/tpu_runlist.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/lrm_tpu_runlist.log}"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_cc"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- [$(date +%H:%M:%S)] $name exit=$?" >> "$LOG"
}

echo "=== runlist start $(date) ===" >> "$LOG"

# 0. tunnel probe (fail fast if the far end is down).  Probe into its own
# file — grepping the append-only $LOG would match a PREVIOUS run's
# device lines and burn hours of timeouts against a dead tunnel.
PROBE=$(mktemp)
timeout 120 python -c "import jax; print(jax.devices())" > "$PROBE" 2>&1
cat "$PROBE" >> "$LOG"
grep -qi "TpuDevice\|tpu" "$PROBE" || { echo "NO TPU — abort" >> "$LOG"; rm -f "$PROBE"; exit 1; }
rm -f "$PROBE"

# Ordered most-valuable-first in case the tunnel flaps mid-list.

# 1. headline bench (4 Mb genome, driver-format JSON line)
run bench 3600 python bench.py

# 2. genome-scale single-chip bench (the never-measured real-TPU row)
run big_full 7200 python scripts/bench_big.py --dir /tmp/lrm_big500 \
    --n-reads 100000 --chunk-b 2048

# 3. Pallas band-DP A/B (VERDICT r2 #1 acceptance shape)
run dirs_ab 3600 python scripts/bench_dirs_ab.py --b 2048 --l 1024 --w 127

# 3b. gather row-width sweep: is sa_ctx gather cost per-row or
# per-element?  (decides the adjacent-slot fusion for seed_vote)
run gather 1200 python scripts/bench_gather.py

# 4. per-stage device phase breakdown (seed_vote ms, e2e vs device)
run profile 3600 env B=2048 RL=1000 python scripts/profile_map.py

# 5. vote-slot budget A/B: fewer gathered sa_ctx rows vs retry-tier cost
# (default sigma 5 = 112 slots at the bench config; 1.0 -> 96, just above
# the simulated phase max 94, so retries stay rare — measures the
# tightest-budget tradeoff)
run bench_s1 3600 env LRM_VOTE_SIGMA=1.0 PASSES=3 python bench.py

# 6. dispatch-latency amortization: one bigger chunk bucket
run bench_b4096 3600 env CHUNK_B=4096 PASSES=3 python bench.py

# 7. Pallas dirs kernel in the full step (only meaningful if #3 wins)
run bench_pallas 3600 env LRM_PALLAS_DIRS=1 PASSES=3 python bench.py

# 7b. packed slot layout: fewer, wider sa_ctx gather rows (decides with
# the #3b row-width sweep whether TPU gather cost is per-row)
run bench_pack2 3600 env LRM_SLOT_PACK=2 PASSES=3 python bench.py
run bench_pack4 3600 env LRM_SLOT_PACK=4 PASSES=3 python bench.py

# 8. genome-scale slim-layout variant
run big_slim 7200 python scripts/bench_big.py --dir /tmp/lrm_big500 \
    --n-reads 100000 --chunk-b 2048 --slim

echo "=== runlist done $(date) ===" >> "$LOG"
