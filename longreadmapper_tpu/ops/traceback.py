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

    Returns ops (B, L+W+1) int8 in reverse path order, padded with OP_PAD.
    A path takes len + #I steps and #I == #D <= ed; reads the pipeline
    accepts have ed <= limit <= W, so L + W + 1 steps always complete
    their walk.  Over-limit reads may truncate — their CIGAR is discarded
    ('*' in SAM, models/mapper.py) exactly as the reference discards
    failed alignments (alnmain.c:466).
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
    _, ops = lax.scan(step, carry0, None, length=min(2 * L, L + W + 1))
    return jnp.transpose(ops)  # (B, L+W+1)


def traceback_v_iters(L: int, W: int) -> int:
    """Iteration bound of device_traceback_v (see its docstring)."""
    return -(-L // 16) + 2 * W + 4


def device_traceback_v(vdirs, lens, L: int, W: int,
                       band_major: bool = False):
    """Run-consuming CIGAR walk over VERTICALLY packed direction words
    (ops/wavefront.banded_nw_dirs_v, or with band_major=True the Pallas
    kernel's transposed emission ops/band_pallas.banded_nw_dirs_vt —
    vdirs (G, band, B) instead of (G, B, band); the gather cost is
    identical either way, ~25 ns/element independent of shape).

    One gather fetches the 16-row word at the walk's current (row-group,
    band column); a whole M-run inside it collapses to one emitted
    (op, count) byte via a count-leading-zeros trick, then the following
    I/D (if still in-word) is applied too.  Iterations needed for a read
    with ed <= W edits: every M-run fragment (split only at 16-row word
    boundaries and at edits) plus every edit consumes one iteration, so

        n_iter = L/16 + 2W + 4

    — ~8x fewer HBM gathers than the per-cell walk (XLA TPU gathers cost
    ~25 ns per ELEMENT regardless of shape, so fewer-and-equal-size beats
    wider).

    Returns runs (B, 2*n_iter) int8 in reverse path order, each byte
    (count << 2) | op with op codes 0=M 1=I 2=D; bytes with op 3 or
    count 0 are padding.
    """
    if band_major:
        G, band, B = vdirs.shape
    else:
        G, B, band = vdirs.shape
    Vf = vdirs.reshape(-1)
    bidx = jnp.arange(B, dtype=jnp.int32)
    n_iter = traceback_v_iters(L, W)

    def step(carry):
        i, j, done = carry
        active = ~done
        d = jnp.clip(j - i + W, 0, band - 1)
        g = jnp.maximum(i - 1, 0) >> 4
        r = jnp.maximum(i - 1, 0) & 15
        flat = ((g * band + d) * B + bidx if band_major
                else (g * B + bidx) * band + d)
        word = jnp.take(Vf, jnp.clip(flat, 0, G * B * band - 1))
        # M-run length at bit-pair r going down: shift cell r to the top,
        # count leading zero pairs (M == 0b00)
        z = (word.astype(jnp.uint32) << (2 * (15 - r)).astype(jnp.uint32))
        mrun = lax.clz(z.astype(jnp.int32)) >> 1
        mrun = jnp.where(active & (i > 0), jnp.minimum(mrun, r + 1), 0)
        i2 = i - mrun
        j2 = j - mrun
        done_mid = (i2 == 0) & (j2 == 0)
        # the edit that ended the run, if its row is still in this word
        # (i2 == 0 is the synthetic all-D row 0)
        in_word = mrun <= r
        cell = (word >> (2 * ((i2 - 1) & 15))) & 3
        op2 = jnp.where(i2 == 0, 2, cell)
        take2 = active & ~done_mid & \
            ((in_word & (i2 > 0)) | ((i2 == 0) & (j2 > 0)))
        i3 = jnp.where(take2 & (op2 == 1), i2 - 1, i2)
        j3 = jnp.where(take2 & (op2 == 2), j2 - 1, j2)
        done3 = done | ((i3 == 0) & (j3 == 0))
        b1 = jnp.where(mrun > 0, (mrun << 2) | OP_M, OP_PAD)
        b2 = jnp.where(take2, 4 | op2, OP_PAD)
        out = jnp.stack([b1, b2], axis=1).astype(jnp.int8)
        return (i3, j3, done3), out

    # while_loop with an all-done early exit: the n_iter bound covers a
    # worst-case ed == W read, but a typical batch finishes in
    # ~L/16 + 2*mean(ed) iterations — half or less
    lens32 = lens.astype(jnp.int32)

    def cond(state):
        it, (i, j, done), _ = state
        return (it < n_iter) & jnp.any(~done)

    def body(state):
        it, carry, buf = state
        carry2, out = step(carry)
        buf = lax.dynamic_update_slice(buf, out[None],
                               (it, jnp.int32(0), jnp.int32(0)))
        return it + 1, carry2, buf

    # derive the buffer from `lens` so the while carry has a consistent
    # device-varying type under shard_map (a replicated-constant input
    # becoming data-varying output is rejected)
    zb8 = (lens32 * 0).astype(jnp.int8)
    buf0 = jnp.full((n_iter, B, 2), OP_PAD, jnp.int8) + zb8[None, :, None]
    carry0 = (lens32, lens32, lens32 <= 0)
    _, _, runs = lax.while_loop(cond, body, (jnp.int32(0), carry0, buf0))
    return jnp.transpose(runs, (1, 0, 2)).reshape(B, -1)
