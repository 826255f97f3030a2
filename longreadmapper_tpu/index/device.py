"""HBM-resident device index: the TPU-native layout of the reference's
in-RAM index set (fmi + lchash + SA + text; alnmain.c:179-256 `init`).

Arrays (all jax, device-resident; pos dtype is int32 when the text fits,
int64 for >2^31-byte genomes):

  packed    (ceil(n/16),) int32   2-bit packed BWT (16 bases/word)
  occ_samp  (ceil(n/16)+1, 4)     exclusive per-word base counts
  c4        (4,)                  C-table entries for A,C,G,T (raw-char C[·])
  sa        (n,)                  full suffix array (sa_access gathers)
  lch       (4^hlen, 2)           precomputed (k, l) SA intervals per k-mer
  text      (n,) int8             .cat text codes (alignment target gathers;
                                  '$' = 4)
  mta_start/mta_len (M,)          contig table for seq_lookup (alnmain.c:151)

Static metadata lives in IndexMeta (hashable; safe as a jit static arg).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..formats.catmeta import MtaEntry, load_cat, load_mta
from ..ops.rank import occ_samples, pack_codes
from .fmi import FMIndex, encode_bytes


class DeviceIndex(NamedTuple):
    packed: jnp.ndarray
    occ_samp: jnp.ndarray
    c4: jnp.ndarray
    sa: jnp.ndarray
    sa_ctx: jnp.ndarray   # (n, 2) int32 fused rows: [SA[p], packed text window]
    lch: jnp.ndarray
    text: jnp.ndarray
    text_packed: jnp.ndarray  # (ceil(n/16),) int32, 2-bit text ('$' as 0 —
                              # consumers remap position n-1 to the sentinel)
    mta_start: jnp.ndarray
    mta_len: jnp.ndarray


@dataclass(frozen=True)
class IndexMeta:
    n: int            # .cat length including '$'
    dollar_pos: int   # row of '$' in the BWT
    hlen: int
    n_contigs: int
    pos_dtype: str    # 'int32' | 'int64'


def _build_sa_ctx(sa: np.ndarray, text_codes: np.ndarray) -> np.ndarray:
    """Fused (SA value, 16-base left-context) rows — the expand-and-verify
    seeding gathers exactly one of these per candidate vote
    (mapping/pipeline.py) instead of running LF-refinement steps.

    ctx word for SA row p: text[SA[p]-16+u] 2-bit packed at bits [2u, 2u+2)
    for u in 0..15 (out-of-range positions pack as 0 — callers gate on
    SA[p] >= prefix length).  Requires n < 2^31 (larger genomes shard the
    index across chips, BASELINE.json configs 3/5)."""
    n = sa.shape[0]
    assert n < 2**31, "fused sa_ctx requires int32 positions; shard instead"
    from ..ops.rank import pack_codes
    # window [SA[p]-16, SA[p]) = two adjacent packed words shift-combined
    # (two gathers + vector shifts instead of 16 byte gathers per row)
    packed = pack_codes(np.where(text_codes < 4, text_codes, 0)
                        ).view(np.uint32)
    packed = np.concatenate([np.zeros(1, np.uint32), packed,
                             np.zeros(2, np.uint32)])  # +1: word index -1 ok
    out = np.empty((n, 2), dtype=np.int32)
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
        out[s:s + chunk, 0] = p.astype(np.int32)
        out[s:s + chunk, 1] = ctx.view(np.int32)
    return out


def build_device_index(fmi: FMIndex, lch_kl: np.ndarray, hlen: int,
                       cat: np.ndarray, mta: list[MtaEntry],
                       ) -> tuple[DeviceIndex, IndexMeta]:
    """Assemble device arrays from host index structures."""
    n = fmi.length
    dtype = np.int32 if n < 2**31 else np.int64
    bwt_codes = encode_bytes(fmi.bwt)
    dollar_pos = int(np.nonzero(bwt_codes == 4)[0][0])
    packed_codes = bwt_codes.copy()
    packed_codes[dollar_pos] = 0
    text_codes = encode_bytes(cat)
    idx = DeviceIndex(
        packed=jnp.asarray(pack_codes(packed_codes)),
        occ_samp=jnp.asarray(occ_samples(bwt_codes, dollar_pos, dtype)),
        c4=jnp.asarray(fmi.c4().astype(dtype)),
        sa=jnp.asarray(fmi.sa.astype(dtype)),
        sa_ctx=jnp.asarray(_build_sa_ctx(fmi.sa, text_codes)),
        lch=jnp.asarray(np.asarray(lch_kl, dtype=np.uint64).astype(dtype)),
        text=jnp.asarray(text_codes.astype(np.int8)),
        text_packed=jnp.asarray(
            pack_codes(np.where(text_codes < 4, text_codes, 0))),
        mta_start=jnp.asarray(np.array([m.offset for m in mta], dtype=dtype)),
        mta_len=jnp.asarray(np.array([m.seq_len for m in mta], dtype=dtype)),
    )
    meta = IndexMeta(n=n, dollar_pos=dollar_pos, hlen=hlen,
                     n_contigs=len(mta), pos_dtype=np.dtype(dtype).name)
    return idx, meta


def load_device_index(genome_path: str) -> tuple[DeviceIndex, IndexMeta, list[MtaEntry]]:
    """Load the persisted artifact set (.mta/.cat/.sa5/.mfi/.lch) to device —
    the accaln `init` equivalent (alnmain.c:179-256)."""
    from ..formats.lch import read_lch

    prefix = genome_path + ".cat"
    fmi = FMIndex.read(prefix, with_sa=True)
    hlen, kl = read_lch(prefix + ".lch")
    cat = load_cat(prefix)
    mta = load_mta(genome_path + ".mta")
    idx, meta = build_device_index(fmi, kl, hlen, cat, mta)
    return idx, meta, mta
