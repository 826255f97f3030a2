"""Microbench: min-plus band scan formulations for the dirs kernel (dev tool).

The dirs_v kernel is HBM-bound: each doubling-scan step materializes a
shifted (B, band) concat (no elementwise fusion across concats), ~9 arrays
per DP row.  Candidates:

  A. current: hand-rolled doubling scan (concat + min) — baseline
  B. cummin:  out = d + lax.cummin(x - d) (one fused XLA op per row)
  C. capped:  doubling scan limited to ceil(log2(W+2)) steps (values
              needing longer propagation exceed the band limit and are
              never walk-relevant)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from longreadmapper_tpu.ops.wavefront import banded_nw_dirs_v

B, L, W, band = 1024, 1024, 102, 256
INF = 0x3FFF


def timeit(fn, *a, n=20):
    r = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def scan_doubling(x, steps):
    s = 1
    for _ in range(steps):
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (s,), INF, x.dtype), x[..., :-s]],
            axis=-1)
        x = jnp.minimum(x, shifted + s)
        s *= 2
    return x


def variant(kind):
    d_idx = jnp.arange(band, dtype=jnp.int32)

    def one_row(x):
        if kind == "cummin":
            return d_idx + lax.cummin(x - d_idx, axis=x.ndim - 1)
        steps = 8 if kind == "full" else int(np.ceil(np.log2(W + 2)))
        return scan_doubling(x, steps)

    @jax.jit
    def run(q, t):
        tpad = jnp.pad(t.astype(jnp.int8), ((0, 0), (W + 1, band)),
                       constant_values=5)

        def step(hprev, i):
            tw = lax.dynamic_slice(tpad, (jnp.int32(0), i), (B, band)
                                   ).astype(jnp.int32)
            qc = lax.dynamic_slice(q, (jnp.int32(0), i - 1), (B, 1)
                                   ).astype(jnp.int32)
            sub = (qc != tw).astype(jnp.int32)
            up = jnp.concatenate(
                [hprev[:, 1:], jnp.full((B, 1), INF, jnp.int32)], axis=1)
            cand = jnp.minimum(hprev + sub, up + 1)
            row = one_row(cand)
            row = jnp.minimum(row, INF)
            return row, row[:, W].astype(jnp.int16)

        row0 = jnp.where((d_idx - W >= 0) & (d_idx - W <= L),
                         jnp.abs(d_idx - W), INF
                         ).astype(jnp.int32)[None] + q[:, :1].astype(jnp.int32) * 0
        _, wc = lax.scan(step, row0, jnp.arange(1, L + 1, dtype=jnp.int32))
        return wc

    return run


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int8))
    t = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int8))

    outs = {}
    for kind in ("full", "cummin", "capped"):
        f = variant(kind)
        dt = timeit(f, q, t)
        outs[kind] = np.asarray(f(q, t))
        print(f"{kind:7s}: {dt*1e3:6.2f} ms "
              f"({B*L*band/dt/1e9:6.1f} Gcells/s)", flush=True)
    np.testing.assert_array_equal(outs["full"], outs["cummin"])
    # capped differs only at cells whose value exceeds the limit; compare
    # where the reference is within band-walk range
    ref = outs["full"].astype(np.int32)
    cap = outs["capped"].astype(np.int32)
    mism = (ref != cap) & (ref <= W)
    print("capped mismatches at walk-relevant cells:", int(mism.sum()))

    # and the real kernel end-to-end for context
    f = jax.jit(lambda q, t: banded_nw_dirs_v(q, t, W, band))
    dt = timeit(f, q, t)
    print(f"banded_nw_dirs_v: {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
