"""On-device batched CIGAR traceback over packed direction bits.

The DP emits 2-bit per-cell directions (ops/wavefront.banded_nw_dirs) — the
full score matrix is never materialized (HBM-write bound) and nothing big
ever crosses the host link: only the op string ((B, 2L) int8) leaves HBM.

The walk follows the stored directions (tie-break M > I > D baked in at DP
time, identical to native/align.cpp `lrm_traceback` — cross-checked in
tests), run as a lax.scan over path steps with every read in a vector lane.
Per-read path lengths differ; finished lanes emit the pad op 3.

Ops are emitted end-to-start; the host reverses and run-length-encodes
(models/mapper.py).  Op codes: 0=M, 1=I (consumes query), 2=D (consumes
target), 3=pad.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

OP_M, OP_I, OP_D, OP_PAD = 0, 1, 2, 3


def device_traceback(dirs, lens, L: int, W: int):
    """dirs: (L+1, B, band//16) int32, 2-bit packed direction per cell
    (ops/wavefront.banded_nw_dirs); lens: (B,).

    Returns ops (B, 2L) int8 in reverse path order, padded with OP_PAD.
    """
    rows, B, nw = dirs.shape
    Df = dirs.reshape(-1)
    bidx = jnp.arange(B, dtype=jnp.int32)

    def step(carry, _):
        i, j, done = carry
        d = j - i + W
        word = jnp.take(Df, jnp.clip((i * B + bidx) * nw + (d >> 4),
                                     0, rows * B * nw - 1))
        dir_ = (word >> (2 * (d & 15))) & 3
        op = jnp.where(done, OP_PAD, dir_)
        i2 = jnp.where((op == OP_M) | (op == OP_I), i - 1, i)
        j2 = jnp.where((op == OP_M) | (op == OP_D), j - 1, j)
        done2 = done | ((i2 == 0) & (j2 == 0))
        return (i2, j2, done2), op.astype(jnp.int8)

    lens32 = lens.astype(jnp.int32)
    carry0 = (lens32, lens32, lens32 <= 0)
    # A path takes len + #I steps and #I == #D <= ed; reads the pipeline
    # accepts have ed <= limit <= W, so L + W + 1 steps always complete
    # their walk.  Over-limit reads may truncate — their CIGAR is discarded
    # ('*' in SAM, models/mapper.py) exactly as the reference discards
    # failed alignments (alnmain.c:466).
    _, ops = lax.scan(step, carry0, None, length=min(2 * L, L + W + 1))
    return jnp.transpose(ops)  # (B, L+W+1)
