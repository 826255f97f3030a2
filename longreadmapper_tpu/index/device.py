"""HBM-resident device index: the TPU-native layout of the reference's
in-RAM index set (fmi + lchash + SA + text; alnmain.c:179-256 `init`).

Arrays (all jax, device-resident):

  packed    (ceil(n/16),) int32   2-bit packed BWT (16 bases/word)
  occ_samp  (ceil(n/16)+1, 4)     exclusive per-word base counts (int32
                                  unless a single base exceeds 2^31 occs)
  c4        (4,)                  C-table entries for A,C,G,T (raw-char C[·])
  sa_ctx    (n, 2) int32          fused rows: [SA[p] low 32 bits, packed
                                  16-base left-context window]
  sa_hi     (n,) uint8             high byte of the 40-bit SA value — only
                                  for n >= 2^31 (None otherwise); gathered
                                  alongside sa_ctx so positions never need
                                  int64 GATHERS (measured 3x slower per row
                                  than int32 pairs on v5e — int64 is
                                  emulated; scripts/bench_gather.py)
  lch       (4^hlen, 2)           precomputed (k, l) SA intervals per k-mer
                                  (low 32 bits when lch_hi is present)
  lch_hi    (4^hlen, 2) uint8      high bytes of (k, l) for n >= 2^31
  text_packed (ceil(n/16),) int32 2-bit text ('$' as 0 — consumers remap
                                  position n-1 to the sentinel)
  mta_start/mta_len (M,)          contig table for seq_lookup (alnmain.c:151)

The full SA and byte text of round 1 were dropped from HBM: the mapping
step never gathers them (the fused sa_ctx and text_packed serve every
lookup), and at genome scale they were 5 of the ~14.5 bytes/position.

Positions are int32 when the .cat fits (n < 2^31) and 40-bit split-hi
otherwise (hg19's .cat is ~6.2e9 bytes — the reason the reference stores
the SA in a 5-byte codec, psascan/sa_use.h:17-28).  The int64 arithmetic
path requires jax x64 mode; load_device_index enables it before first use.

Static metadata lives in IndexMeta (hashable; safe as a jit static arg).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..formats.catmeta import MtaEntry, load_cat, load_mta
from ..ops.rank import occ_samples, pack_codes
from .fmi import FMIndex, encode_bytes


class DeviceIndex(NamedTuple):
    packed: jnp.ndarray
    occ_samp: jnp.ndarray
    c4: jnp.ndarray
    sa_ctx: jnp.ndarray            # (n, 2) int32: [SA low32, ctx window]
    sa_hi: Optional[jnp.ndarray]   # (n,) uint8 SA high byte | None (int32 n)
    lch: jnp.ndarray
    lch_hi: Optional[jnp.ndarray]  # (4^hlen, 2) uint8 | None (int32 n)
    text_packed: jnp.ndarray
    mta_start: jnp.ndarray
    mta_len: jnp.ndarray


@dataclass(frozen=True)
class IndexMeta:
    n: int            # .cat length including '$'
    dollar_pos: int   # row of '$' in the BWT
    hlen: int
    n_contigs: int
    pos_dtype: str    # 'int32' | 'int64'


def _pack_ctx_words(sa: np.ndarray, text_codes: np.ndarray) -> np.ndarray:
    """(n,) int32 16-base left-context windows for each SA row.

    ctx word for SA row p: text[SA[p]-16+u] 2-bit packed at bits [2u, 2u+2)
    for u in 0..15 (out-of-range positions pack as 0 — callers gate on
    SA[p] >= prefix length).  The expand-and-verify seeding
    (mapping/pipeline.py) gathers one [SA, ctx] row per candidate vote
    instead of running LF-refinement steps."""
    n = sa.shape[0]
    packed = pack_codes(np.where(text_codes < 4, text_codes, 0)
                        ).view(np.uint32)
    packed = np.concatenate([np.zeros(1, np.uint32), packed,
                             np.zeros(2, np.uint32)])  # +1: word index -1 ok
    out = np.empty(n, dtype=np.int32)
    chunk = 1 << 21
    for s in range(0, n, chunk):
        p = sa[s:s + chunk].astype(np.int64)
        start = p - 16
        w0 = (start >> 4) + 1                 # +1 for the zero pad word
        o = (start & 15).astype(np.uint32)
        lo = packed[np.maximum(w0, 0)] >> (2 * o)
        hi_raw = packed[np.maximum(w0, 0) + 1].astype(np.uint64)
        hi = (hi_raw << (32 - 2 * o)).astype(np.uint64) & 0xFFFFFFFF
        ctx = (lo | hi.astype(np.uint32))
        # positions < 0 must pack as 0: for p < 16 only the TOP 2p bits
        # (text positions 0..p-1) are real — zero the low 2*(16-p) bits
        short = p < 16
        if short.any():
            low = (2 * (16 - p.clip(0, 16))).astype(np.uint64)
            keep = ((np.uint64(0xFFFFFFFF) << low) & np.uint64(0xFFFFFFFF)
                    ).astype(np.uint32)
            ctx = np.where(short, ctx & keep, ctx)
        out[s:s + chunk] = ctx.view(np.int32)
    return out


def build_device_index(fmi: FMIndex, lch_kl: np.ndarray, hlen: int,
                       cat: np.ndarray, mta: list[MtaEntry],
                       force_pos_dtype: str | None = None,
                       ) -> tuple[DeviceIndex, IndexMeta]:
    """Assemble device arrays from host index structures.

    `force_pos_dtype='int64'` builds the split-hi genome-scale layout even
    for small n (the int64-path parity tests use it)."""
    n = fmi.length
    pos64 = (n >= 2**31) if force_pos_dtype is None \
        else force_pos_dtype == "int64"
    if pos64:
        _require_x64()
    dtype = np.int64 if pos64 else np.int32
    bwt_codes = encode_bytes(fmi.bwt)
    dollar_pos = int(np.nonzero(bwt_codes == 4)[0][0])
    packed_codes = bwt_codes.copy()
    packed_codes[dollar_pos] = 0
    text_codes = encode_bytes(cat)

    sa = fmi.sa
    ctx = _pack_ctx_words(sa, text_codes)
    sa_ctx = np.empty((n, 2), dtype=np.int32)
    sa_ctx[:, 0] = (sa & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    sa_ctx[:, 1] = ctx
    sa_hi = (sa >> 32).astype(np.uint8) if pos64 else None

    kl = np.asarray(lch_kl, dtype=np.uint64)
    if pos64:
        lch = (kl & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        lch_hi = (kl >> np.uint64(32)).astype(np.uint8)
    else:
        lch = kl.astype(np.int32)
        lch_hi = None

    idx = DeviceIndex(
        packed=jnp.asarray(pack_codes(packed_codes)),
        occ_samp=jnp.asarray(occ_samples(bwt_codes, dollar_pos)),
        c4=jnp.asarray(fmi.c4().astype(dtype)),
        sa_ctx=jnp.asarray(sa_ctx),
        sa_hi=None if sa_hi is None else jnp.asarray(sa_hi),
        lch=jnp.asarray(lch),
        lch_hi=None if lch_hi is None else jnp.asarray(lch_hi),
        text_packed=jnp.asarray(
            pack_codes(np.where(text_codes < 4, text_codes, 0))),
        mta_start=jnp.asarray(np.array([m.offset for m in mta], dtype=dtype)),
        mta_len=jnp.asarray(np.array([m.seq_len for m in mta], dtype=dtype)),
    )
    meta = IndexMeta(n=n, dollar_pos=dollar_pos, hlen=hlen,
                     n_contigs=len(mta), pos_dtype=np.dtype(dtype).name)
    return idx, meta


def _require_x64() -> None:
    """int64 position arithmetic needs jax x64 mode; enable it if nothing
    has been traced yet, with a clear error if the backend already ran."""
    import jax
    if jax.config.jax_enable_x64:
        return
    jax.config.update("jax_enable_x64", True)


def load_device_index(genome_path: str, force_pos_dtype: str | None = None,
                      ) -> tuple[DeviceIndex, IndexMeta, list[MtaEntry]]:
    """Load the persisted artifact set (.mta/.cat/.sa5/.mfi/.lch) to device —
    the accaln `init` equivalent (alnmain.c:179-256)."""
    from ..formats.lch import read_lch

    prefix = genome_path + ".cat"
    fmi = FMIndex.read(prefix, with_sa=True)
    hlen, kl = read_lch(prefix + ".lch")
    cat = load_cat(prefix)
    mta = load_mta(genome_path + ".mta")
    idx, meta = build_device_index(fmi, kl, hlen, cat, mta,
                                   force_pos_dtype=force_pos_dtype)
    return idx, meta, mta
