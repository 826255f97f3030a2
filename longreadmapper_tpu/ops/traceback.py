"""On-device batched CIGAR traceback.

The banded score matrix H is large ((B, L+1, band) int16 — tens of MB per
chunk) and the host link is the slowest resource in the system; walking the
traceback on-device means only the op string ((B, 2L) int8) ever leaves HBM.

The walk is the standard banded-NW argmin chase (same tie-break M > I > D as
native/align.cpp `lrm_traceback` — the two are cross-checked in tests), run
as a lax.scan over path steps with every read in a vector lane.  Per-read
path lengths differ; finished lanes emit the pad op 3.

Ops are emitted end-to-start; the host reverses and run-length-encodes
(models/mapper.py).  Op codes: 0=M, 1=I (consumes query), 2=D (consumes
target), 3=pad.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .wavefront import INF

OP_M, OP_I, OP_D, OP_PAD = 0, 1, 2, 3


def device_traceback(H, q, t, lens, W: int):
    """H: (B, L+1, band) int16; q, t: (B, L) codes; lens: (B,).

    Returns ops (B, 2L) int8 in reverse path order, padded with OP_PAD.
    """
    B, rows, band = H.shape
    L = rows - 1
    Hf = H.reshape(B, rows * band).astype(jnp.int32)
    q32 = q.astype(jnp.int32)
    t32 = t.astype(jnp.int32)
    lens32 = lens.astype(jnp.int32)
    bidx = jnp.arange(B)

    def cell(i, d):
        flat = jnp.clip(i * band + d, 0, rows * band - 1)
        return jnp.take_along_axis(Hf, flat[:, None], axis=1)[:, 0]

    def step(carry, _):
        i, j, done = carry
        d = j - i + W
        cur = cell(i, d)
        qc = jnp.take_along_axis(q32, jnp.clip(i - 1, 0, L - 1)[:, None],
                                 axis=1)[:, 0]
        tc = jnp.take_along_axis(t32, jnp.clip(j - 1, 0, L - 1)[:, None],
                                 axis=1)[:, 0]
        sub = jnp.where(qc != tc, 1, 0)
        diag_ok = (i > 0) & (j > 0) & (cell(i - 1, d) + sub == cur) \
            & (cell(i - 1, d) < INF)
        up_ok = (i > 0) & (d + 1 < band) & (cell(i - 1, d + 1) + 1 == cur)
        left_ok = (j > 0) & (d - 1 >= 0) & (cell(i, d - 1) + 1 == cur)
        op = jnp.where(done, OP_PAD,
                       jnp.where(diag_ok, OP_M,
                                 jnp.where(up_ok, OP_I,
                                           jnp.where(left_ok, OP_D, OP_PAD))))
        i2 = jnp.where(op == OP_M, i - 1, jnp.where(op == OP_I, i - 1, i))
        j2 = jnp.where(op == OP_M, j - 1, jnp.where(op == OP_D, j - 1, j))
        # a PAD op on an unfinished lane means inconsistent H — freeze it
        done2 = done | ((i2 == 0) & (j2 == 0)) | (op == OP_PAD)
        return (i2, j2, done2), op.astype(jnp.int8)

    carry0 = (lens32, lens32, lens32 < 0)
    _, ops = lax.scan(step, carry0, None, length=2 * L)
    return jnp.transpose(ops)  # (B, 2L)
