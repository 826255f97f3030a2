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


def _seg_min_scan(head, x, axis):
    """Segmented inclusive min-scan: resets at positions where head=True."""

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))

    _, out = lax.associative_scan(combine, (head, x), axis=axis)
    return out


@jax.jit
def top2_votes(keys, valid):
    """keys: (B, V) signed int; valid: (B, V) bool.

    Insertion order = flattened position v (callers lay votes out in the
    reference's iteration order: seed-major, SA-hit-minor).
    """
    B, V = keys.shape
    assert V <= _ORD_MASK
    pos = jnp.arange(V, dtype=jnp.int64)[None, :]

    bucket = (keys >> 4).astype(jnp.int64)
    bkt_packed = jnp.where(valid, bucket + _BUCKET_OFF,
                           jnp.int64(1) << 40)  # invalid sentinel, sorts last
    composite = (bkt_packed << _ORD_BITS) | pos
    comp_s = jnp.sort(composite, axis=1)
    bkt_s = comp_s >> _ORD_BITS
    orig_s = (comp_s & _ORD_MASK).astype(jnp.int32)
    keys_s = jnp.take_along_axis(keys, orig_s.astype(jnp.int64), axis=1)
    valid_s = bkt_s != (jnp.int64(1) << 40)

    # run structure over sorted buckets
    first_col = jnp.ones((B, 1), dtype=bool)
    head = jnp.concatenate([first_col, bkt_s[:, 1:] != bkt_s[:, :-1]], axis=1)
    idx = jnp.arange(V, dtype=jnp.int32)[None, :]
    run_start = lax.cummax(jnp.where(head, idx, -1), axis=1)
    rank = idx - run_start + 1  # in-run vote count so far
    is_last = jnp.concatenate([head[:, 1:], first_col], axis=1)

    min_key = _seg_min_scan(head, keys_s.astype(jnp.int64), axis=1)
    # first insertion position of the run = orig index at the run head
    first_occ = _seg_min_scan(head, orig_s.astype(jnp.int64), axis=1)

    run_score = jnp.where(
        is_last & valid_s,
        rank.astype(jnp.int64) * V + (V - 1 - first_occ),
        jnp.int64(-1),
    )
    top1 = jnp.argmax(run_score, axis=1)
    t1 = jnp.take_along_axis(run_score, top1[:, None], axis=1)[:, 0]
    v1 = jnp.where(t1 >= 0,
                   jnp.take_along_axis(rank, top1[:, None], axis=1)[:, 0], 0)
    key1 = jnp.where(
        t1 >= 0,
        jnp.take_along_axis(min_key, top1[:, None], axis=1)[:, 0], 0)

    score2 = run_score.at[jnp.arange(B), top1].set(-1)
    top2 = jnp.argmax(score2, axis=1)
    t2 = jnp.take_along_axis(score2, top2[:, None], axis=1)[:, 0]
    v2 = jnp.where(t2 >= 0,
                   jnp.take_along_axis(rank, top2[:, None], axis=1)[:, 0], 0)

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
