#!/usr/bin/env python
"""A/B the short-read band-DP direction sweep: XLA scan vs Pallas kernel.

VERDICT r2 next #1 acceptance: the Pallas band-on-sublanes kernel
(ops/band_pallas.banded_nw_dirs_vt) must beat ops/wavefront.banded_nw_dirs_v
by >= 2x at (B, L, band) = (2048, 1024, 256) with bit-identical direction
words — or this script's numbers are the recorded decisive negative.

Prints per-variant wall times (best of N after warmup) and verifies
bit-identical vdirs/wcol (the Pallas words are band-major; compared after
transpose).

Usage: bench_dirs_ab.py [--b 2048] [--l 1024] [--w 127] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--l", type=int, default=1024)
    ap.add_argument("--w", type=int, default=127)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (correctness only)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from longreadmapper_tpu.ops.band_pallas import (HAVE_PALLAS,
                                                    banded_nw_dirs_vt)
    from longreadmapper_tpu.ops.wavefront import banded_nw_dirs_v

    if not HAVE_PALLAS:
        print("pallas unavailable in this jaxlib — cannot A/B", file=sys.stderr)
        return 2

    B, L, W = args.b, args.l, args.w
    band = -(-(2 * W + 1) // 128) * 128
    print(f"devices: {jax.devices()}  B={B} L={L} W={W} band={band}",
          file=sys.stderr)

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.integers(0, 4, (B, L)), jnp.int32)
    # targets resemble the real pipeline's: query + sparse edits
    t = np.asarray(q)
    mask = rng.random((B, L)) < 0.03
    t = np.where(mask, rng.integers(0, 4, (B, L)), t)
    t = jnp.asarray(t, jnp.int32)

    def timeit(fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = None
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    dt_x, (vd_x, wc_x) = timeit(banded_nw_dirs_v, q, t, W, band)
    dt_p, (vd_p, wc_p) = timeit(banded_nw_dirs_vt, q, t, W, band,
                                interpret=args.interpret)

    # parity: Pallas emits band-major (G, band, B); XLA emits (G, B, band)
    same_v = bool(jnp.array_equal(jnp.transpose(vd_p, (0, 2, 1)), vd_x))
    same_w = bool(jnp.array_equal(wc_p, wc_x))
    gc = B * L * band / 1e9
    print(f"xla_scan:  {dt_x * 1e3:8.2f} ms  {gc / dt_x:6.1f} Gcells/s")
    print(f"pallas:    {dt_p * 1e3:8.2f} ms  {gc / dt_p:6.1f} Gcells/s  "
          f"speedup x{dt_x / dt_p:.2f}")
    print(f"parity: vdirs={'OK' if same_v else 'MISMATCH'} "
          f"wcol={'OK' if same_w else 'MISMATCH'}")
    return 0 if (same_v and same_w) else 1


if __name__ == "__main__":
    sys.exit(main())
