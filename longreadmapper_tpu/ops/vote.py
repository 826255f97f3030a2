"""Vectorized histogram voting (top-2 diagonal buckets).

Replaces the reference's O(n)-per-add linear-scan histogram
(/root/reference/histo/histo.c:42-56, SURVEY.md "known-weak") with one
sort + segmented-scan pass per read batch, while reproducing its exact
semantics:

  - bucket id   = key >> 4 (16 bp diagonal quantization, histo.c:26-28).
    Keys here are SIGNED positions (SA[hit] - seed_offset can go negative
    where the reference wraps in u64); floor-division bucketing and in-bucket
    min-key agree between the signed and u64-wrapped views, so parity holds.
  - per bucket: vote count, MINIMUM key (histo.c:49), and first-insertion
    order for tie-breaking.
  - top-2 selection = max by (count desc, insertion-order asc) — exactly the
    stable two-max linear scan of histo_find_2_max (histo.c:84-96).

Returns (v1, key1, v2): top-1 count, top-1 bucket's min key, top-2 count
(the reference uses v1+v2 for the score and cand[0] = (key1, v1)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_ORD_BITS = 22           # max 4M votes per read-phase
_ORD_MASK = (1 << _ORD_BITS) - 1
_BUCKET_OFF = 1 << 30    # shifts signed buckets non-negative for packing
_SENT = 1 << 40          # invalid-lane bucket sentinel (sorts last)


@jax.jit
def top2_votes(keys, valid):
    """keys: (B, V) signed int; valid: (B, V) bool.

    Insertion order = flattened position v (callers lay votes out in the
    reference's iteration order: seed-major, SA-hit-minor).

    ONE stable int32 sort by bucket with a packed (pos, key&15) payload:
      - stability => the head of each bucket run carries the run's
        first-insertion position (the histo tie-breaker);
      - all keys in a bucket share key>>4, so the run's MIN key is
        bucket*16 + min(key&15) — a 4-bit segmented min, computed by
        pointer-doubling (sound on sorted data: bucket equality at distance
        s implies the whole stretch is one run);
      - run lengths come from head indices via a reverse cummin.
    """
    B, V = keys.shape
    assert V <= _ORD_MASK
    pos = jnp.arange(V, dtype=jnp.int32)[None, :]

    # bucket in int32: key>>4 + 128 covers seed offsets up to 2048 bases
    # negative and text lengths to 2^35
    bucket = ((keys >> 4) + 128).astype(jnp.int32)
    bucket = jnp.where(valid, bucket, jnp.int32(0x7FFFFFFF))
    payload = (pos << 4) | (keys & 15).astype(jnp.int32)
    b_s, p_s = lax.sort((bucket, jnp.broadcast_to(payload, (B, V))),
                        dimension=1, is_stable=True, num_keys=1)
    pos_s = p_s >> 4
    low4_s = p_s & 15
    valid_s = b_s != jnp.int32(0x7FFFFFFF)
    first_col = jnp.ones((B, 1), dtype=bool)
    head = jnp.concatenate([first_col, b_s[:, 1:] != b_s[:, :-1]], axis=1)

    # segmented suffix-min of low4 within runs (doubling over sorted runs)
    x = low4_s
    s = 1
    while s < V:
        xs = jnp.concatenate([x[:, s:], jnp.full((B, s), 15, x.dtype)], axis=1)
        bs = jnp.concatenate(
            [b_s[:, s:], jnp.full((B, s), -1, b_s.dtype)], axis=1)
        x = jnp.minimum(x, jnp.where(bs == b_s, xs, 15))
        s *= 2
    min_key = (b_s.astype(jnp.int64) - 128) * 16 + x   # valid at run heads

    idx = jnp.arange(V, dtype=jnp.int32)[None, :]
    # next head strictly after v: reverse-cummin of head positions, shifted
    hp = jnp.where(head, idx, V)
    nh = jnp.flip(lax.cummin(jnp.flip(hp, axis=1), axis=1), axis=1)
    nh_after = jnp.concatenate([nh[:, 1:], jnp.full((B, 1), V, jnp.int32)],
                               axis=1)
    count = nh_after - idx                       # run length, valid at heads
    first_occ = pos_s                            # = min pos, at run heads

    score = jnp.where(head & valid_s,
                      count.astype(jnp.int64) * V + (V - 1 - first_occ),
                      jnp.int64(-1))
    top1 = jnp.argmax(score, axis=1)
    t1 = jnp.take_along_axis(score, top1[:, None], axis=1)[:, 0]
    v1 = jnp.where(t1 >= 0,
                   jnp.take_along_axis(count, top1[:, None], axis=1)[:, 0], 0)
    key1 = jnp.where(
        t1 >= 0,
        jnp.take_along_axis(min_key, top1[:, None], axis=1)[:, 0], 0)

    score2 = score.at[jnp.arange(B), top1].set(-1)
    top2 = jnp.argmax(score2, axis=1)
    t2 = jnp.take_along_axis(score2, top2[:, None], axis=1)[:, 0]
    v2 = jnp.where(t2 >= 0,
                   jnp.take_along_axis(count, top2[:, None], axis=1)[:, 0], 0)

    return v1.astype(jnp.int32), key1, v2.astype(jnp.int32)


@jax.jit
def top2_small_histo(keys, valid):
    """Top-2 for small per-read histograms (the outer cross-phase histogram,
    alnmain.c:386-403): same semantics, O(P^2) dense — P is ~21."""
    B, P = keys.shape
    bucket = (keys >> 4).astype(jnp.int64)
    eq = (bucket[:, :, None] == bucket[:, None, :]) & valid[:, :, None] & valid[:, None, :]
    counts = eq.sum(axis=2).astype(jnp.int32)
    pidx = jnp.arange(P, dtype=jnp.int32)
    earlier = eq & (pidx[None, None, :] < pidx[None, :, None])
    is_first = valid & ~earlier.any(axis=2)
    big = jnp.int64(1) << 60
    min_key = jnp.min(jnp.where(eq, keys[:, None, :], big), axis=2)
    score = jnp.where(is_first,
                      counts.astype(jnp.int64) * P + (P - 1 - pidx)[None, :],
                      jnp.int64(-1))
    top1 = jnp.argmax(score, axis=1)
    t1 = jnp.take_along_axis(score, top1[:, None], axis=1)[:, 0]
    v1 = jnp.where(t1 >= 0,
                   jnp.take_along_axis(counts, top1[:, None], axis=1)[:, 0], 0)
    key1 = jnp.where(t1 >= 0,
                     jnp.take_along_axis(min_key, top1[:, None], axis=1)[:, 0], 0)
    score2 = score.at[jnp.arange(B), top1].set(-1)
    v2raw = jnp.take_along_axis(counts, jnp.argmax(score2, axis=1)[:, None], axis=1)[:, 0]
    v2 = jnp.where(jnp.max(score2, axis=1) >= 0, v2raw, 0)
    return v1, key1, v2
