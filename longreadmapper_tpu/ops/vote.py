"""Vectorized histogram voting (top-2 diagonal buckets), int32-clean.

Replaces the reference's O(n)-per-add linear-scan histogram
(/root/reference/histo/histo.c:42-56, SURVEY.md "known-weak") with one
stable sort + run analysis per read batch, while reproducing its exact
semantics:

  - bucket id   = key >> 4 (16 bp diagonal quantization, histo.c:26-28).
    Keys here are SIGNED 32-bit positions (SA[hit] - seed_offset can go
    negative where the reference wraps in u64); floor-division bucketing and
    in-bucket min-key agree between the signed and u64-wrapped views, so
    parity holds for texts < 2^31.
  - per bucket: vote count, MINIMUM key (histo.c:49), and first-insertion
    order for tie-breaking.
  - top-2 selection = max by (count desc, insertion-order asc) — exactly the
    stable two-max linear scan of histo_find_2_max (histo.c:84-96), realized
    as a two-stage argmax (max count, then min first-occurrence among ties)
    so no 64-bit score packing is needed.

ONE stable int32 sort by bucket with a packed (pos, key&15) payload:
  - stability => the head of each bucket run carries the run's
    first-insertion position;
  - all keys in a bucket share key>>4, so the run's MIN key is
    bucket*16 + min(key&15) — a 4-bit segmented min by pointer-doubling
    (sound on sorted data: bucket equality at distance s implies the whole
    stretch is one run).

Returns (v1, key1, v2): top-1 count, top-1 bucket's min key, top-2 count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_ORD_BITS = 27           # max 128M votes per read-phase (payload pos bits)
_SENT = jnp.int32(0x7FFFFFFF)


def _top1(count, first_occ, eligible):
    """(count desc, first_occ asc) argmax over axis 1, int32-only.

    Returns (idx, cnt): position of the winner and its count (0 if none).
    """
    c = jnp.where(eligible, count, -1)
    cmax = jnp.max(c, axis=1, keepdims=True)
    fo = jnp.where(eligible & (count == cmax) & (cmax >= 0),
                   first_occ, _SENT)
    idx = jnp.argmin(fo, axis=1)
    cnt = jnp.maximum(cmax[:, 0], 0)
    return idx, cnt


@jax.jit
def top2_votes(keys, valid):
    """keys: (B, V) signed int32 — or int64 on the genome-scale path, where
    the sort runs on the bitcast (hi, lo) int32 pair (num_keys=2) so no
    int64 sort lanes are needed; valid: (B, V) bool.

    Insertion order = flattened position v (callers lay votes out in the
    reference's iteration order: seed-major, SA-hit-minor).
    """
    wide = keys.dtype == jnp.int64
    if not wide:
        keys = keys.astype(jnp.int32)
    B, V = keys.shape
    assert V < (1 << (_ORD_BITS - 4))
    pos = jnp.arange(V, dtype=jnp.int32)[None, :]
    payload = jnp.broadcast_to((pos << 4), (B, V)) | (keys & 15).astype(jnp.int32)

    if wide:
        # bucket as (hi signed, lo-with-flipped-sign-bit) int32 pair —
        # lexicographic signed order == signed int64 order
        bucket64 = keys >> 4
        bl = lax.bitcast_convert_type(bucket64, jnp.int32)
        b_hi = jnp.where(valid, bl[..., 1], _SENT)
        b_lo = jnp.where(valid, bl[..., 0] ^ jnp.int32(-0x80000000), _SENT)
        bh_s, blo_s, p_s = lax.sort((b_hi, b_lo, payload), dimension=1,
                                    is_stable=True, num_keys=2)
        valid_s = ~((bh_s == _SENT) & (blo_s == _SENT))
    else:
        # bucket in int32: key>>4 + 128 keeps seed-offset-negative keys ordered
        bucket = jnp.where(valid, (keys >> 4) + 128, _SENT)
        b_s, p_s = lax.sort((bucket, payload), dimension=1, is_stable=True,
                            num_keys=1)
        valid_s = b_s != _SENT
    pos_s = p_s >> 4
    low4_s = p_s & 15
    first_col = jnp.ones((B, 1), dtype=bool)
    if wide:
        head = jnp.concatenate(
            [first_col, (bh_s[:, 1:] != bh_s[:, :-1])
             | (blo_s[:, 1:] != blo_s[:, :-1])], axis=1)
    else:
        head = jnp.concatenate([first_col, b_s[:, 1:] != b_s[:, :-1]], axis=1)

    # segmented suffix-min of low4 within runs (doubling over sorted runs)
    def shifted_eq(s):
        if wide:
            h = jnp.concatenate(
                [bh_s[:, s:], jnp.full((B, s), -1, jnp.int32)], axis=1)
            lo = jnp.concatenate(
                [blo_s[:, s:], jnp.full((B, s), -1, jnp.int32)], axis=1)
            return (h == bh_s) & (lo == blo_s)
        bs = jnp.concatenate(
            [b_s[:, s:], jnp.full((B, s), -1, b_s.dtype)], axis=1)
        return bs == b_s

    x = low4_s
    s = 1
    while s < V:
        xs = jnp.concatenate([x[:, s:], jnp.full((B, s), 15, x.dtype)], axis=1)
        x = jnp.minimum(x, jnp.where(shifted_eq(s), xs, 15))
        s *= 2
    if wide:
        blo_un = blo_s ^ jnp.int32(-0x80000000)
        bucket_s = ((bh_s.astype(jnp.int64) << 32)
                    | blo_un.astype(jnp.uint32).astype(jnp.int64))
        min_key = bucket_s * 16 + x               # valid at run heads
    else:
        min_key = (b_s - 128) * 16 + x            # valid at run heads

    idx = jnp.arange(V, dtype=jnp.int32)[None, :]
    # next head strictly after v: reverse-cummin of head positions, shifted
    hp = jnp.where(head, idx, V)
    nh = jnp.flip(lax.cummin(jnp.flip(hp, axis=1), axis=1), axis=1)
    nh_after = jnp.concatenate([nh[:, 1:], jnp.full((B, 1), V, jnp.int32)],
                               axis=1)
    count = nh_after - idx                       # run length, valid at heads
    first_occ = pos_s                            # = min pos, at run heads

    eligible = head & valid_s
    top1, v1 = _top1(count, first_occ, eligible)
    key1 = jnp.where(
        v1 > 0, jnp.take_along_axis(min_key, top1[:, None], axis=1)[:, 0], 0)
    eligible2 = eligible & (idx != top1[:, None])
    _, v2 = _top1(count, first_occ, eligible2)
    return v1, key1, v2


@jax.jit
def top2_small_histo(keys, valid):
    """Top-2 for small per-read histograms (the outer cross-phase histogram,
    alnmain.c:386-403): same semantics, O(P^2) dense — P is ~21.  int64
    keys (genome-scale path) compare directly; P^2 is tiny."""
    if keys.dtype != jnp.int64:
        keys = keys.astype(jnp.int32)
    B, P = keys.shape
    sent = jnp.asarray(jnp.iinfo(keys.dtype).max, keys.dtype)
    bucket = keys >> 4
    eq = (bucket[:, :, None] == bucket[:, None, :]) \
        & valid[:, :, None] & valid[:, None, :]
    counts = eq.sum(axis=2).astype(jnp.int32)
    pidx = jnp.arange(P, dtype=jnp.int32)
    earlier = eq & (pidx[None, None, :] < pidx[None, :, None])
    is_first = valid & ~earlier.any(axis=2)
    min_key = jnp.min(jnp.where(eq, keys[:, None, :], sent), axis=2)
    top1, v1 = _top1(counts, jnp.broadcast_to(pidx[None, :], (B, P)), is_first)
    key1 = jnp.where(
        v1 > 0, jnp.take_along_axis(min_key, top1[:, None], axis=1)[:, 0], 0)
    eligible2 = is_first & (pidx[None, :] != top1[:, None])
    _, v2 = _top1(counts, jnp.broadcast_to(pidx[None, :], (B, P)), eligible2)
    return v1, key1, v2
