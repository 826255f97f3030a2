#!/bin/bash
# Round-5 TPU capture list (decision rules: scripts/RUNLIST_DECISIONS.md).
# Sequential — the tunnel serves ONE process.  Every step's output is
# TEED into the repo at bench_captures/r05/<step>.log so a degraded
# end-of-round driver row can never leave the round's TPU numbers
# unevidenced (VERDICT r4 next #4); the driver commits any uncommitted
# files at round end, and the builder commits them sooner when present.
#
# Usage: bash scripts/tpu_runlist_r5.sh [logfile]
# NOTE: suspend any host-side index build first (1-core box, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/lrm_tpu_runlist_r5.log}"
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

echo "=== runlist r5 start $(date) ===" >> "$LOG"

# 0. tunnel probe incl. a D2H round trip (the degradation mode passes
# jax.devices() but stalls minutes on any fetch)
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

# 2. FIRST COMMITTED LONG-READ ROWS (VERDICT r5 #2): 10 kb reads through
# the tiled gact path — c-walk default vs the v-walk fallback, then the
# bigger-batch variant (CHUNK_B=5120 -> gact B=512)
run bench_long10k    3600 env RLEN=10000 NREADS=2048 PASSES=3 python bench.py
run bench_long10k_v  3600 env RLEN=10000 NREADS=2048 PASSES=3 LRM_TB_COLWALK=0 python bench.py
run bench_long10k_b512 3600 env RLEN=10000 NREADS=2048 PASSES=3 CHUNK_B=5120 python bench.py

# 3. long-read stage split with REALISTIC windows, two batch sizes
run profile_gact_b64  2400 env B=64 RL=10000 HLEN=14 \
    PROF_CACHE=/tmp/lrm_bench_cache_g4_h14 python scripts/profile_gact.py
run profile_gact_b256 2400 env B=256 RL=10000 HLEN=14 \
    PROF_CACHE=/tmp/lrm_bench_cache_g4_h14 python scripts/profile_gact.py

# 4. short-read stage split at hlen 14 (round-4 retry; closure-constants
# bug fixed)
run profile 2400 env B=2048 RL=1000 HLEN=14 \
    PROF_CACHE=/tmp/lrm_bench_cache_g4_h14 python scripts/profile_map.py

# 5. Pallas band-DP e2e (round-4 retry; decides LRM_PALLAS_DIRS default)
run bench_pallas 2400 env LRM_PALLAS_DIRS=1 PASSES=3 python bench.py

# 6. forced 64-slot budget at hlen 14 (round-4 retry; healthy link only)
run bench_v64 2400 env LRM_VOTE_SLOTS=64 PASSES=3 python bench.py

# 7. eager CIGAR head 64 -> 16 entries: the pass's dominant D2H blob is
# meta+head (328 KB/chunk at 64); a subs-only 1 kb read needs ~2 entries
# and the lazy tail covers the rest — decides the LRM_OPS_HEAD default
run bench_head16 2400 env LRM_OPS_HEAD=16 PASSES=3 python bench.py

# 7b. narrow-band short-read pass (W 102 -> 63 shrinks band 256 -> 128;
# ed at 3% err is 30 +- 5.4 so the retry tier ~never fires here)
run bench_sb63 2400 env LRM_SHORT_BAND=63 PASSES=3 python bench.py

# 8. repeat-genome throughput on the real chip (VERDICT r4 weak #4: the
# wide-lane + retry-tier cost on repeat-heavy genomes had no TPU
# number).  Single (20, 300) point, 10k reads; chunk 2048 reuses the
# hlen-12 compiled program when cached
run repeat_tpu 3600 env LRM_SWEEP_TPU=1 python scripts/sweep_mini.py \
    --n-reads 10000 --seed-lens 20 --thres 300 --chunk-b 2048 \
    --out bench_captures/r05/repeat_tpu.jsonl

# 9. 800 Mb genome, slim layout — a size where the FULL layout (~17 GB)
# exceeds the chip's 16 GB HBM but slim (~11.8 GB) fits: slim's raison
# d'etre measured.  Guarded: the 1-core host build takes ~2.5 h and may
# not have finished when this list fires.
if [ -d /tmp/lrm_big800/ref.fa.cat.devidx ]; then
  run big800_slim 7200 python scripts/bench_big.py --dir /tmp/lrm_big800 \
      --n-reads 100000 --chunk-b 2048 --slim
else
  echo "big800 index not ready — skipped" >> "$LOG"
fi

echo "=== runlist r5 done $(date) ===" >> "$LOG"
