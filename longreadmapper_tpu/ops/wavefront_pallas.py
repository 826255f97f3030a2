"""Pallas TPU kernel for the banded-NW score matrix (GACT DP core).

Same contract as ops/wavefront.banded_nw_scores (parity-checked by the
TPU-gated test in tests/test_ops.py), hand-scheduled for the VPU.

MEASURED HONESTLY (v5e, B=128 L=1024 band=256): this kernel runs ~1.7x
SLOWER than the XLA lax.scan version (16 ms vs 9.6 ms) — Mosaic lowers the
log2(band) pltpu.roll lane-shifts of the min-plus scan as full-register
relayouts, while XLA fuses the equivalent concatenate-shifts into the
elementwise bundle.  It is kept as the reference hand-written kernel and a
starting point for a future layout (rows-in-registers across a transposed
band) that avoids per-row lane rolls; the production path uses the XLA
implementation (ops/wavefront.py).

Structure:

  - grid over read blocks of 16 (one sublane each); the band lives in lanes
  - Mosaic only allows lane-dim slices at 128-aligned offsets, so rows are
    processed in groups of 128: each group loads one aligned (16, band+256)
    target window and one aligned (16, 128) query column block, then the 128
    rows inside the group use STATIC in-register slices (python-unrolled)
  - the in-row insertion recurrence H(i,j-1)+1 is a min-plus prefix scan
    done with log2(band) lane-rolls (pltpu.roll) + masked adds
  - H rows are written at dynamic offsets on the LEADING (untiled) dim,
    layout (L+1, B, band) int16 — same as the jnp implementation

The reference's alignment loop is its OpenACC offload region
(/root/reference/alnmain.c:420-424) — this kernel is the TPU-native
equivalent (SURVEY.md P2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import INF

B_BLK = 8    # reads per kernel instance (sublanes)
RGRP = 128   # rows per aligned group


def _make_kernel(L: int, W: int, band: int):
    n_grp = L // RGRP

    def _kernel(q_ref, t_ref, h_ref, hprev, rows_buf):
        dt = jnp.int32
        lane = lax.broadcasted_iota(dt, (B_BLK, band), 1)

        # row 0: H(0, j) = j inside the band, INF outside
        j0 = lane - W
        row0 = jnp.where((j0 >= 0) & (j0 <= L), jnp.maximum(j0, 0), INF)
        hprev[:, :] = row0
        h_ref[pl.ds(0, 1), :, :] = row0[None, :, :].astype(jnp.int16)

        def group(g, _):
            base = pl.multiple_of(g * RGRP, RGRP)
            twin = t_ref[:, pl.ds(base, band + 2 * RGRP)].astype(dt)
            qwin = q_ref[:, pl.ds(base, RGRP)].astype(dt)
            prev = hprev[:, :]
            for r in range(RGRP):
                i_off = r + 1  # row i = base + r + 1
                tw = lax.slice_in_dim(twin, i_off, i_off + band, axis=1)
                qc = lax.slice_in_dim(qwin, r, r + 1, axis=1)
                sub = jnp.where(qc != tw, 1, 0)
                up = pltpu.roll(prev, band - 1, axis=1)   # lane d <- d+1
                up = jnp.where(lane == band - 1, INF, up)
                x = jnp.minimum(prev + sub, up + 1)
                s = 1
                while s < band:                      # min-plus prefix scan
                    sh = pltpu.roll(x, s, axis=1)
                    sh = jnp.where(lane < s, INF, sh)
                    x = jnp.minimum(x, sh + s)
                    s *= 2
                j = (base + i_off) + lane - W
                prev = jnp.where((j >= 0) & (j <= L),
                                 jnp.minimum(x, INF), INF)
                rows_buf[r, :, :] = prev.astype(jnp.int16)  # static index
            hprev[:, :] = prev
            # one bulk dynamic write per group
            h_ref[pl.ds(base + 1, RGRP), :, :] = rows_buf[:, :, :]
            return 0

        lax.fori_loop(0, n_grp, group, 0)

    return _kernel


@partial(jax.jit, static_argnames=("W", "band"))
def banded_nw_scores_pallas(q, t, W: int, band: int):
    """q: (B, L) query codes; t: (B, L) target codes ('$'/pad remapped != q).

    Returns H: (L+1, B, band) int16.  Requires B % 8 == 0 and L % 128 == 0.
    """
    B, L = q.shape
    assert B % B_BLK == 0 and L % RGRP == 0, (B, L)
    # tw for row i reads tpad[:, i + d] (front pad W+1); the last group
    # slices up to L - RGRP + band + 2*RGRP lanes
    Lp = L + band + 2 * RGRP
    tpad = jnp.zeros((B, Lp), jnp.int32)
    tpad = lax.dynamic_update_slice(tpad + 5, t.astype(jnp.int32), (0, W + 1))

    return pl.pallas_call(
        _make_kernel(L, W, band),
        grid=(B // B_BLK,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, Lp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L + 1, B_BLK, band), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L + 1, B, band), jnp.int16),
        scratch_shapes=[pltpu.VMEM((B_BLK, band), jnp.int32),
                        pltpu.VMEM((RGRP, B_BLK, band), jnp.int16)],
        cost_estimate=pl.CostEstimate(
            flops=B * (L + 1) * band * 30, transcendentals=0,
            bytes_accessed=B * (L + 1) * band * 2),
    )(q.astype(jnp.int32), tpad)
