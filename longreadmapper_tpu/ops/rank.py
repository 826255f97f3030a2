"""TPU-native FM-index rank (Occ) and backward-search primitives.

The reference's hot loop `_occ_access` (/root/reference/fmidx/fmidx.c:277-293)
rescans up to o_ratio BWT *bytes* per backward-search step.  The TPU design
stores the BWT 2-bit packed, 16 bases per int32 word, with per-word sampled
counts — one rank query is then exactly two HBM gathers (sample row + packed
word) plus a popcount, fully vectorized over thousands of query lanes:

    packed[i]      int32, bases 16i..16i+15, base b at bits [2b, 2b+1]
    occ_samp[i,c]  count of base c in bwt[0 .. 16i-1]   (exclusive)
    occ(c, loc)    = occ_samp[loc>>4, c] + popcount(matches in word, <= loc)

The single '$' in the BWT is packed as code 0 and corrected via its known
position, so counts match the reference exactly ('$' never counted:
fmidx.c:148).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

_M01 = 0x55555555  # even-bit mask: one bit per 2-bit base slot


# ----------------------------------------------------------------- host side

def pack_codes(codes: np.ndarray) -> np.ndarray:
    """Pack 2-bit base codes (values 0..3) into int32 words, 16 per word.

    Code at text position p lives in word p>>4 at bit offset 2*(p&15).
    Values >= 4 (the '$') must be remapped by the caller before packing.
    """
    codes = np.asarray(codes, dtype=np.uint32)
    assert codes.max(initial=0) < 4
    n = codes.shape[0]
    nw = (n + 15) // 16
    padded = np.zeros(nw * 16, dtype=np.uint32)
    padded[:n] = codes
    padded = padded.reshape(nw, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :]
    words = np.bitwise_or.reduce(padded << shifts, axis=1)
    return words.view(np.int32)


def occ_samples(codes: np.ndarray, dollar_pos: int, dtype=np.int32) -> np.ndarray:
    """(nw+1, 4) exclusive per-word base counts; the '$' position not counted."""
    codes = np.asarray(codes)
    n = codes.shape[0]
    nw = (n + 15) // 16
    oh = np.zeros((nw * 16, 4), dtype=np.int64)
    pos = np.arange(n)
    valid = (codes < 4) & (pos != dollar_pos)
    oh[pos[valid], codes[valid]] = 1
    per_word = oh.reshape(nw, 16, 4).sum(axis=1)
    out = np.zeros((nw + 1, 4), dtype=np.int64)
    np.cumsum(per_word, axis=0, out=out[1:])
    return out.astype(dtype)


# --------------------------------------------------------------- device side

def occ(packed, occ_samp, dollar_pos, c, loc):
    """Vectorized occ(c, loc) = #occurrences of base c in bwt[0..loc].

    c: int32 base codes in [0, 4) (callers mask N lanes), loc: int >= 0.
    All arguments broadcast; gathers clamp out-of-range lanes (masked upstream).
    """
    c = c.astype(jnp.int32)
    loc = loc.astype(packed.dtype) if packed.dtype == jnp.int64 else loc
    wid = (loc >> 4).astype(jnp.int32)
    off = (loc & 15).astype(jnp.int32)
    word = packed[jnp.clip(wid, 0, packed.shape[0] - 1)]
    pat = word ^ (c * jnp.int32(_M01))
    hit = (~pat) & (~(pat >> 1)) & jnp.int32(_M01)
    keep = jnp.int32(_M01) >> (2 * (15 - off))
    cnt = lax.population_count(hit & keep)
    # '$' is packed as code 0; subtract its spurious 'A' when in range.
    d_wid = jnp.int32(dollar_pos >> 4)
    d_off = jnp.int32(dollar_pos & 15)
    cnt = cnt - ((c == 0) & (wid == d_wid) & (d_off <= off)).astype(jnp.int32)
    samp = occ_samp[jnp.clip(wid, 0, occ_samp.shape[0] - 1), c]
    return samp + cnt.astype(occ_samp.dtype)


def backward_step(c4, packed, occ_samp, dollar_pos, k, l, c, active):
    """One LF backward-search step (fmidx.c:306-308), masked.

    k_new = C[c] + occ(c, k-1) + 1 ; l_new = C[c] + occ(c, l).
    `active` lanes update; inactive lanes (already empty interval, absent
    lchash entry, done early) pass (k, l) through unchanged.  Lanes whose
    next character is N (c == 4) become the empty interval (1, 0) — the
    reference behavior there is UB on uninitialized mapper entries
    (fmidx.c:297-301); this is our defined replacement.
    """
    is_n = c >= 4
    cc = jnp.minimum(c, 3).astype(jnp.int32)
    safe_k = jnp.maximum(k, 1)
    safe_l = jnp.clip(l, 0, occ_samp.shape[0] * 16 - 1)
    cbase = c4[cc]
    k_new = cbase + occ(packed, occ_samp, dollar_pos, cc, safe_k - 1) + 1
    l_new = cbase + occ(packed, occ_samp, dollar_pos, cc, safe_l)
    k_new = jnp.where(is_n, jnp.ones_like(k_new), k_new)
    l_new = jnp.where(is_n, jnp.zeros_like(l_new), l_new)
    k_out = jnp.where(active, k_new, k)
    l_out = jnp.where(active, l_new, l)
    return k_out, l_out
