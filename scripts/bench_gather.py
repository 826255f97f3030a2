"""Microbench: sa_ctx gather layouts on the real chip (dev tool).

Question: does gathering (R,) int64 rows cost half of (R, 2) int32 rows?
(TPU gathers cost ~25 ns per ELEMENT — CLAUDE.md measured fact — so fusing
the (sa, ctx) pair into one int64 element should halve the seeding
pipeline's dominant gather.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")   # int64 table variant
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, n=20):
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    n = 8_000_000
    rng = np.random.default_rng(0)
    tbl32 = jnp.asarray(rng.integers(0, 1 << 30, (n, 2), dtype=np.int32))
    tbl64 = jnp.asarray(rng.integers(0, 1 << 60, (n,), dtype=np.int64))
    for rows in (2_000_000, 5_500_000):
        idx = jnp.asarray(rng.integers(0, n, rows, dtype=np.int32))

        @jax.jit
        def g32(i):
            r = tbl32[i]
            return r[:, 0] + r[:, 1]

        @jax.jit
        def g64(i):
            r = tbl64[i]
            return (r >> 32).astype(jnp.int32) + r.astype(jnp.int32)

        t32 = timeit(g32, idx)
        t64 = timeit(g64, idx)
        print(f"rows={rows}: (R,2) int32 gather {t32*1e3:.2f} ms | "
              f"(R,) int64 gather {t64*1e3:.2f} ms | ratio {t32/t64:.2f}", flush=True)


if __name__ == "__main__":
    main()
