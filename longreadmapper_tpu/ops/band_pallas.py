"""Pallas TPU kernel for the banded NW direction sweep (the short-read DP).

Same observable contract as ops/wavefront.banded_nw_dirs_v — the vertically
packed 2-bit traceback words plus the band-center score column — but laid
out for the VPU instead of for XLA's scan lowering:

  * BAND lives on SUBLANES (32 int32 vregs at band=256), the read batch on
    LANES (blocks of 128).  The min-plus scan's doubling shifts then lower
    to vreg renames for s >= 8 and cheap sublane shifts for s = 1,2,4 —
    round 1's Pallas attempt lost 1.7x to XLA precisely because band-on-
    lanes turned every scan shift into a full lane-crossing relayout
    (CLAUDE.md perf ledger; ops/wavefront_pallas.py post-mortem).
  * The scan runs on the slope transform A[d] = cand[d] - d, so each
    doubling step is a single vreg min (no per-step "+ s" adds); the
    result d + min-scan(A) is the exact min-plus value, bit-identical to
    both XLA lowerings in ops/wavefront._minplus_scan.
  * One grid step emits one packed direction word (16 DP rows); the DP
    carry row persists in a VMEM scratch across the sequential TPU grid.
  * Direction words come out BAND-MAJOR — (L//16, band, B) — because that
    is what the kernel can store without a transpose; the run-consuming
    walk takes the layout as a flag (ops/traceback.device_traceback_v),
    its gather cost being identical either way (~25 ns/element, shape-
    independent).

Reference behavior being accelerated: the unit-cost global alignment inside
the accelerated region of the reference's aligner (/root/reference/
alnmain.c:420-424 OpenACC offload; mutils.c:94-105 align contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .wavefront import INF

BBLK = 128          # lanes per grid step (one vreg width)
_GROUP = 16         # DP rows per packed direction word


def _dirs_kernel(qT_ref, tpadT_ref, vdirs_ref, wcol_ref, h_ref,
                 *, L: int, W: int, band: int):
    g = pl.program_id(1)
    d_idx = lax.broadcasted_iota(jnp.int32, (band, BBLK), 0)

    @pl.when(g == 0)
    def _init():
        j0 = d_idx - W
        h_ref[:] = jnp.where((j0 >= 0) & (j0 <= L),
                             jnp.maximum(j0, 0), INF).astype(jnp.int32)

    # one dynamic (vreg-aligned) window load per group; per-row windows
    # are then STATIC sublane slices of it (renames + sub-8 shifts)
    win = tpadT_ref[pl.ds(pl.multiple_of(g * _GROUP, 8), band + 24), :]
    qg = qT_ref[...]

    h = h_ref[...]
    word = jnp.zeros((band, BBLK), jnp.int32)
    inf_row = jnp.full((1, BBLK), INF, jnp.int32)
    for r in range(_GROUP):
        i = g * _GROUP + 1 + r
        tw = win[r + 1:r + 1 + band]
        qc = qg[r, :][None, :]
        sub = (qc != tw).astype(jnp.int32)
        up = jnp.concatenate([h[1:], inf_row], axis=0)
        a = h + sub
        b = up + 1
        cand = jnp.minimum(a, b)
        # exact min-plus via slope transform: row = d + minscan(cand - d)
        A = cand - d_idx
        s = 1
        while s < band:
            A = jnp.minimum(
                A, jnp.concatenate(
                    [jnp.full((s, BBLK), INF, jnp.int32), A[:-s]], axis=0))
            s *= 2
        row = A + d_idx
        j = i + d_idx - W
        row = jnp.where((j >= 0) & (j <= L), jnp.minimum(row, INF), INF)
        diag_ok = (h < INF) & (a == row)
        up_ok = b == row
        dirs = jnp.where(diag_ok, 0, jnp.where(up_ok, 1, 2))
        word = word | (dirs << (2 * r))
        wcol_ref[r, :] = row[W, :]
        h = row
    h_ref[...] = h
    vdirs_ref[0] = word


try:                                    # pallas needs a TPU-capable jaxlib
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:                       # pragma: no cover
    HAVE_PALLAS = False


@partial(jax.jit, static_argnames=("W", "band", "interpret"))
def banded_nw_dirs_vt(q, t, W: int, band: int, interpret: bool = False):
    """Pallas banded_nw_dirs_v: returns (vdirsT, wcol) where
    vdirsT (L//16, band, B) int32 == transpose(banded_nw_dirs_v's vdirs)
    and wcol (L+1, B) int16 is bit-identical.

    q (B, L) query codes (pad 4), t (B, L) target codes (pad/'$' -> 5);
    requires L % 16 == 0.  B is padded to a lane-block multiple internally.
    """
    B, L = q.shape
    assert L % _GROUP == 0
    G = L // _GROUP
    Bp = -(-B // BBLK) * BBLK
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)), constant_values=4)
        t = jnp.pad(t, ((0, Bp - B), (0, 0)), constant_values=5)

    # tpadT[x, b] = t[b, x - W - 1] for W+1 <= x < W+1+L else 5; sized so
    # every group's aligned (band + 24) window stays in bounds
    Lpad = -(-(L + band + 24) // 8) * 8
    tpadT = jnp.full((Lpad, Bp), 5, jnp.int32)
    tpadT = lax.dynamic_update_slice(
        tpadT, t.astype(jnp.int32).T, (W + 1, 0))
    qT = q.astype(jnp.int32).T

    grid = (Bp // BBLK, G)
    vdirsT, wcol_body = pl.pallas_call(
        partial(_dirs_kernel, L=L, W=W, band=band),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_GROUP, BBLK), lambda b, g: (g, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lpad, BBLK), lambda b, g: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, band, BBLK), lambda b, g: (g, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_GROUP, BBLK), lambda b, g: (g, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, band, Bp), jnp.int32),
            jax.ShapeDtypeStruct((L, Bp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((band, BBLK), jnp.int32)],
        interpret=interpret,
    )(qT, tpadT)

    # row 0 of wcol is H(0, W-W) = 0; derive from q so the value stays
    # device-varying under shard_map (CLAUDE.md carry rule)
    wcol0 = (q[:, 0].astype(jnp.int32) * 0)[None, :]
    wcol = jnp.concatenate([wcol0, wcol_body], axis=0).astype(jnp.int16)
    if Bp != B:
        return vdirsT[:, :, :B], wcol[:, :B]
    return vdirsT, wcol
