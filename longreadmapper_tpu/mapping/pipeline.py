"""The batched device mapping step: seed -> vote -> locate -> align.

Replicates the per-read control flow of the reference's PART 1-3
(/root/reference/alnmain.c:330-477) as masked, batched JAX:

  for iter in 0..seed_len+gap (phase-shifted seed tilings, :349):
      seeds at j = iter, iter+sl+gl, ... while j < len - sl        (:353)
      lc_aln each seed; informative iff 0 < hits < thres           (:356-360)
      every SA hit votes diagonal SA[k]-j into an in-phase histo   (:362-367)
      score = top2_votes / (len // (sl+gl))                        (:371-375)
      score > 0.6  -> accept top-1, stop                           (:378-384)
      else top-1 key joins the cross-phase (outer) histogram       (:386-388)
  no acceptance OR acceptance on the LAST phase -> best = outer top-1
      (:400-403 — note `iter >= sl+gl-1` is also true when the break
       happened at iter == sl+gl-1, overwriting that acceptance; we
       replicate this quirk)

  locate: seq_lookup maps the winning .cat offset to (contig, strand,
      forward offset) (:151-176); reverse-strand reads are
      reverse-complemented before alignment (:433-438)
  align: banded NW vs the same-length window at the located offset with
      limit = (int)(ERROR_RATE * len * 2) (:428); distance > limit => -1
      (unmapped, flag 0x4)

The phase loop is a lax.while_loop with per-read done masks — it runs
max(phases-to-accept) iterations for the whole batch, not always all 21.
Everything is static-shaped; per-seed SA-interval expansion is capped at
thres-1 (exact: informative seeds have < thres hits).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..index.device import DeviceIndex, IndexMeta
from ..ops.rank import backward_step
from ..ops.traceback import device_traceback
from ..ops.vote import top2_small_histo, top2_votes
from ..ops.wavefront import banded_nw_dirs
from ..utils.config import Params


@dataclass(frozen=True)
class MapperConfig:
    """Static pipeline shape parameters (hashable; closed over by jit)."""
    B: int               # reads per device chunk
    L: int               # padded max read length
    seed_len: int
    gap_len: int
    thres: int
    hit_cap: int
    hlen: int
    n: int               # .cat length
    dollar_pos: int
    accept_score: float
    error_rate: float

    @property
    def phases(self) -> int:
        return self.seed_len + self.gap_len

    @property
    def step(self) -> int:
        return self.seed_len + self.gap_len

    @property
    def max_seeds(self) -> int:
        # j = iter + s*step, strict j < L - seed_len (alnmain.c:353)
        if self.L <= self.seed_len:
            return 1
        return max(1, -(-(self.L - self.seed_len) // self.step))

    vote_budget: int = 1024   # max votes kept per read-phase (0 = exact full)

    @property
    def accept_frac(self):
        """accept_score as an exact small rational (num, den)."""
        from fractions import Fraction
        f = Fraction(self.accept_score).limit_denominator(10000)
        return f.numerator, f.denominator

    @property
    def vote_slots(self) -> int:
        full = self.max_seeds * self.hit_cap
        if self.vote_budget <= 0:
            return full
        return min(full, -(-self.vote_budget // 128) * 128)

    @property
    def W(self) -> int:
        # static band half-width >= every read's limit (len <= L)
        return max(8, int(self.error_rate * self.L * 2))

    @property
    def band(self) -> int:
        return -(-(2 * self.W + 1) // 128) * 128

    @staticmethod
    def from_params(p: Params, meta: IndexMeta, B: int, L: int) -> "MapperConfig":
        return MapperConfig(
            B=B, L=L, seed_len=p.seed_len, gap_len=p.gap_len, thres=p.thres,
            hit_cap=p.effective_hit_cap(), hlen=meta.hlen, n=meta.n,
            dollar_pos=meta.dollar_pos, accept_score=p.accept_score,
            error_rate=p.error_rate, vote_budget=p.vote_budget)


def _seed_phase(cfg: MapperConfig, idx: DeviceIndex, codes, lens, it):
    """One seeding phase for the whole batch: returns (v1, key1, v2, num_seeds)."""
    B, S, sl, hlen = cfg.B, cfg.max_seeds, cfg.seed_len, cfg.hlen
    left = sl - hlen
    pos_dtype = idx.sa.dtype

    j = it + jnp.arange(S, dtype=jnp.int32) * cfg.step            # (S,)
    seed_ok = j[None, :] < (lens[:, None].astype(jnp.int32) - sl)  # (B,S)

    # gather seed codes (B, S, sl)
    gidx = jnp.clip(j[:, None] + jnp.arange(sl, dtype=jnp.int32)[None, :],
                    0, cfg.L - 1)                                  # (S, sl)
    seeds = codes[:, gidx].astype(jnp.int32)                       # (B,S,sl)

    # lc_aln (lchash.c:89-104): 2-bit hash of the LAST hlen bases
    tail = seeds[:, :, left:]                                      # (B,S,hlen)
    weights = (2 * (hlen - 1 - np.arange(hlen))).astype(np.int32)
    num = jnp.sum(tail << jnp.asarray(weights), axis=-1)  # hlen<=15: int32
    hash_ok = jnp.all(tail < 4, axis=-1)
    num = jnp.clip(num, 0, (1 << (2 * hlen)) - 1)
    kl = idx.lch[num]                                              # (B,S,2)
    k, l = kl[..., 0], kl[..., 1]
    present = hash_ok & seed_ok & ~((k == 0) & (l == 0))

    if left > 0:
        def bstep(carry, i):
            kk, ll = carry
            c = seeds[:, :, left - 1 - i]
            kk, ll = backward_step(idx.c4, idx.packed, idx.occ_samp,
                                   cfg.dollar_pos, kk, ll, c,
                                   present & (kk <= ll))
            return (kk, ll), None
        (k, l), _ = lax.scan(bstep, (k, l), jnp.arange(left))

    hits = jnp.where(present & (k <= l), (l - k + 1).astype(jnp.int32), 0)
    informative = (hits > 0) & (hits < cfg.thres)                  # (B,S)

    # SA-interval expansion, COMPACTED (alnmain.c:362-367): instead of a
    # dense (S, thres-1) slot grid (mostly empty — a unique 20-mer has 1
    # hit), lay the actual votes out contiguously: slot c belongs to seed
    # s = searchsorted(cumsum(hits), c) at in-seed offset c - cum[s-1].
    # Order is (seed-major, hit-minor) — exactly the reference insertion
    # order.  Reads whose total votes exceed the budget drop the tail and
    # raise the per-read `overflow` flag (callers surface it; the budget
    # default covers everything a random genome produces).
    inf_hits = jnp.where(informative, hits, 0)
    cum = jnp.cumsum(inf_hits, axis=1)                             # (B,S)
    total = cum[:, -1]
    starts = cum - inf_hits                                        # (B,S)
    C = cfg.vote_slots
    slots = jnp.arange(C, dtype=jnp.int32)
    # seed index per slot: the contributing seed with the largest start
    # offset <= c (dense compare-reduce — TPU scatters serialize, a
    # (B,S,C) bool reduce is bandwidth-trivial)
    sid = jnp.arange(S, dtype=jnp.int32)
    owns = informative[:, :, None] & (starts[:, :, None] <= slots[None, None, :])
    s_idx = jnp.max(jnp.where(owns, sid[None, :, None], -1), axis=1)  # (B,C)
    s_safe = jnp.clip(s_idx, 0, S - 1)
    t_off = slots[None, :] - jnp.take_along_axis(starts, s_safe, axis=1)
    vvalid = (s_idx >= 0) & (slots[None, :] < jnp.minimum(total, C)[:, None])
    k_sel = jnp.take_along_axis(k, s_safe, axis=1).astype(pos_dtype)
    j_sel = j[s_safe]
    pos = jnp.clip(k_sel + t_off, 0, cfg.n - 1)
    keys = idx.sa[pos].astype(jnp.int32) - j_sel.astype(jnp.int32)
    v1, key1, v2 = top2_votes(keys, vvalid)
    num_seeds = (lens.astype(jnp.int32) // cfg.step)
    return v1, key1, v2, num_seeds, total > C


def _seed_vote(cfg: MapperConfig, idx: DeviceIndex, codes, lens):
    """The full phase loop; returns best candidate .cat offset per read."""
    B, P = cfg.B, cfg.phases

    def cond(state):
        it, done, *_ = state
        return (it < P) & jnp.any(~done)

    def body(state):
        it, done, best, acc_it, okeys, ovalid, oflow = state
        v1, key1, v2, num_seeds, phase_oflow = _seed_phase(cfg, idx, codes,
                                                           lens, it)
        oflow = oflow | (~done & phase_oflow)
        has_seeds = num_seeds > 0
        # `(double)v / num_seeds > 0.6` (alnmain.c:375-378) as an exact
        # rational compare (f64 is emulated on TPU): equivalent to the C
        # double compare for all feasible v, num_seeds (the gap between
        # the double literal and the rational is ~2e-17)
        num, den = cfg.accept_frac
        accept = has_seeds & ((v1 + v2) * den > num * num_seeds)
        newly = ~done & accept
        best = jnp.where(newly, key1, best)
        acc_it = jnp.where(newly, it, acc_it)
        # outer histogram add (alnmain.c:386-388): non-accepted phases with
        # a nonzero top-1 vote contribute their top-1 key
        outer_add = ~done & has_seeds & ~accept & (v1 != 0)
        onehot = (jnp.arange(P, dtype=jnp.int32) == it)[None, :]
        okeys = jnp.where(onehot & outer_add[:, None], key1[:, None], okeys)
        ovalid = ovalid | (onehot & outer_add[:, None])
        done = done | newly
        return it + 1, done, best, acc_it, okeys, ovalid, oflow

    # initial carry derived from `lens` so every component carries the same
    # device-varying type under shard_map (scan/while carries must not mix
    # replicated-constant and sharded values)
    zb = (lens * 0).astype(jnp.int32)                 # (B,) varying zeros
    state0 = (
        jnp.int32(0),
        zb > 0,                                        # done: all False
        zb,                                            # best
        zb - 1,                                        # accepted-at phase
        jnp.broadcast_to(zb[:, None], (B, P)),
        jnp.broadcast_to((zb > 0)[:, None], (B, P)),
        zb > 0,                                        # vote-budget overflow
    )
    _, done, best, acc_it, okeys, ovalid, oflow = lax.while_loop(
        cond, body, state0)

    # post-loop overwrite (alnmain.c:400-403): reads that never accepted OR
    # accepted exactly on the last phase take the outer histogram's top-1
    _, okey1, _ = top2_small_histo(okeys, ovalid)
    need_outer = ~done | (acc_it == P - 1)
    return jnp.where(need_outer, okey1, best), oflow


def _seq_lookup(idx: DeviceIndex, loc, qlen):
    """Vectorized seq_lookup (alnmain.c:151-176): first contig whose forward
    or reverse half fully contains [loc, loc+qlen)."""
    pdt = idx.mta_start.dtype
    start = idx.mta_start[None, :]                     # (1,M)
    slen = idx.mta_len[None, :]
    end = start + 2 * slen
    loc_ = loc.astype(pdt)[:, None]
    q_ = qlen[:, None].astype(pdt)
    fwd = (loc_ >= start) & (loc_ + q_ <= start + slen)
    rev = (loc_ >= start + slen) & (loc_ + q_ <= end)
    hit = fwd | rev
    found = jnp.any(hit, axis=1)
    gi = jnp.argmax(hit, axis=1)
    g_start = jnp.take(idx.mta_start, gi)
    g_len = jnp.take(idx.mta_len, gi)
    g_end = g_start + 2 * g_len
    strand = jnp.take_along_axis(rev, gi[:, None], axis=1)[:, 0] & found
    off = jnp.where(strand, g_end - loc.astype(pdt) - qlen.astype(pdt),
                    loc.astype(pdt) - g_start)
    loc_fwd = jnp.where(strand, off + g_start, loc)
    return found, gi.astype(jnp.int32), strand, off, loc_fwd


def make_map_step(cfg: MapperConfig):
    """Build the jitted device mapping step.

    step(idx, codes (B,L) int8, lens (B,) int32, limits (B,) int32) ->
      dict(best, found, gi, strand, off, ed, limit, ops, overflow)

    `limits` = (int)(ERROR_RATE * len * 2) computed HOST-side in float64
    (alnmain.c:428 C double semantics, exactly).
    """

    @jax.jit
    def step(idx: DeviceIndex, codes, lens, limits):
        B, L, W, band = cfg.B, cfg.L, cfg.W, cfg.band
        best, overflow = _seed_vote(cfg, idx, codes, lens)

        # PART 2: locate + align (alnmain.c:420-451)
        found, gi, strand, off, loc_fwd = _seq_lookup(idx, best, lens)
        safe_loc = jnp.clip(jnp.where(found, loc_fwd, 0), 0, cfg.n - 1)

        # reverse complement reads that hit the reverse half (:433-438)
        i_idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        rc_pos = jnp.clip(lens[:, None].astype(jnp.int32) - 1 - i_idx, 0, L - 1)
        q_rc_raw = jnp.take_along_axis(codes, rc_pos, axis=1)
        q_rc = jnp.where(q_rc_raw < 4, 3 - q_rc_raw, q_rc_raw)
        in_read = i_idx < lens[:, None].astype(jnp.int32)
        q_rc = jnp.where(in_read, q_rc, jnp.int8(4)).astype(jnp.int8)
        q = jnp.where(strand[:, None], q_rc, codes)

        # target window gather; '$'/padding -> 5 so it never matches
        tpos = jnp.clip(safe_loc[:, None] + i_idx.astype(safe_loc.dtype),
                        0, cfg.n - 1)
        t = idx.text[tpos]
        t = jnp.where(t >= 4, jnp.int8(5), t)

        dirs, wcol = banded_nw_dirs(q, t, W, band)
        ed_raw = wcol[lens, jnp.arange(B)].astype(jnp.int32)
        limit = limits.astype(jnp.int32)
        ed = jnp.where(ed_raw <= limit, ed_raw, -1)

        # CIGAR walk stays on-device over the packed direction bits; only
        # the (B, 2L) op string leaves HBM
        ops = device_traceback(dirs, lens, L, W)

        return dict(best=best, found=found, gi=gi, strand=strand, off=off,
                    ed=ed, limit=limit, ops=ops, overflow=overflow)

    return step
