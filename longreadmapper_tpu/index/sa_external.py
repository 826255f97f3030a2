"""External-memory (blocked) suffix-array construction.

The pSAscan-class capability the in-RAM SA-IS lacks
(/root/reference/psascan/src/psascan_src/psascan.h:52-57): build
`<prefix>.sa5` with a bounded-RAM working set for texts whose ~11.5 B/char
in-RAM footprint exceeds the host.  Design doc: docs/EXTERNAL_SA.md.

Algorithm (extended-margin blocks + exact repair + streamed merge):

1. Split the mmap'd text into blocks of ~ram/12 bytes.  Each block is
   suffix-sorted by the native SA-IS over the block EXTENDED by `margin`
   bytes (implicit-sentinel convention).  For kept (in-block) suffixes
   the result is exact except where two suffixes share their entire
   common extension — those pairs necessarily share the first `margin`
   bytes, so grouping maximal runs of margin-prefix-equal entries and
   re-sorting each group with an exact whole-text comparator repairs the
   order (the grouping is transitive, hence a superset of the true tie
   relation).  The last block extends to the real terminator: exact as-is.
2. Partial SAs spill to disk and are K-way merged.  Default: the native
   streamed merge (native/samerge.cpp) — cached 8-byte prefix keys with
   exact memcmp tie-breaks against the mmap'd text; since the text's
   final byte is unique, every comparison resolves in-text and the
   output is exactly the global suffix order.  Fallback (LRM_SA_MERGE=py
   or no toolchain): a numpy merge ordered by a 24-byte prefix key
   (3 big-endian u64 words, non-decreasing along each partial SA); runs
   of EQUAL keys are re-sorted with the exact comparator, and entries
   are only emitted below the smallest last-loaded key of any block with
   unloaded entries, so unloaded data can never interleave below an
   emitted entry.
3. The merged stream is written directly in the 40-bit .sa5 codec.

Peak RAM = one block's SA-IS working set (~11.5 B/char of block) + O(K)
merge buffers; the text is memory-mapped (page cache, evictable).
Pathological inputs (a single 24-byte context shared by more suffixes
than a merge chunk) degrade to comparator-ordered emission, still exact.

Byte-identical to the in-RAM build (tests/test_sa_external.py, including
tandem-satellite texts that force both repair paths).
"""

from __future__ import annotations

import functools
import os
import tempfile

import numpy as np

from .. import native
from ..formats.ui40 import Sa5Writer

_KEYB = 24          # merge prefix-key bytes (3 u64 words)
_CHUNK = 1 << 15    # merge load granularity (entries)


def _suffix_less(X, a: int, b: int, step: int = 4096) -> bool:
    """Exact whole-text suffix comparison (ground truth).  The text ends
    with a unique terminator, so distinct suffixes always differ before
    both slices run out; python bytes order == implicit-sentinel order
    (a proper prefix sorts smaller)."""
    assert a != b
    n = X.shape[0]
    while a < n and b < n:
        ca = X[a:a + step].tobytes()
        cb = X[b:b + step].tobytes()
        if ca != cb:
            return ca < cb
        a += step
        b += step
    return a >= n  # the exhausted suffix is the smaller one


def _repair_groups(X, pos: np.ndarray, starts_of_groups) -> np.ndarray:
    key = functools.cmp_to_key(
        lambda a, b: -1 if _suffix_less(X, a, b) else 1)
    out = pos.copy()
    for s, e in starts_of_groups:
        out[s:e] = sorted(pos[s:e].tolist(), key=key)
    return out


def _equal_runs(eq_adjacent: np.ndarray):
    """[(start, end)] of maximal runs where eq_adjacent[i] marks
    element i equal to element i+1."""
    runs = []
    i = 0
    m = eq_adjacent.shape[0]
    while i < m:
        if eq_adjacent[i]:
            j = i
            while j < m and eq_adjacent[j]:
                j += 1
            runs.append((i, j + 1))
            i = j
        else:
            i += 1
    return runs


def _block_sa(X, b: int, e: int, margin: int) -> np.ndarray:
    """Exact suffix order (absolute positions) of text suffixes starting
    in [b, e)."""
    n = X.shape[0]
    ext_end = min(e + margin, n)
    ext = np.asarray(X[b:ext_end])
    sa = native.suffix_array(ext)
    sa = sa[sa < (e - b)]
    if ext_end == n:
        return sa + b  # extension reaches the real terminator: exact

    # Suspect pairs share their first `margin` bytes (every kept suffix
    # has >= margin bytes of extension).  Stage 1: vectorized 16-byte
    # prefix equality of adjacent entries (strided window rows — no
    # (m, 16) index matrix); stage 2: escalate to full margin equality;
    # then repair margin-equal runs exactly.
    win = np.lib.stride_tricks.sliding_window_view(ext, 16)
    k16 = win[sa]
    eq16 = np.all(k16[:-1] == k16[1:], axis=1)
    eqm = np.zeros_like(eq16)
    for i in np.nonzero(eq16)[0]:
        p, q = int(sa[i]), int(sa[i + 1])
        eqm[i] = ext[p:p + margin].tobytes() == ext[q:q + margin].tobytes()
    if not eqm.any():
        return sa + b
    return _repair_groups(X, sa + b, [(s, t) for s, t in _equal_runs(eqm)])


def _keys(X, pos: np.ndarray):
    """(w0, w1, w2) big-endian u64 prefix-key words for absolute
    positions; positions within _KEYB of the end pad with 0 (only ever
    after the unique terminator, so never decisive)."""
    n = X.shape[0]
    m = pos.shape[0]
    raw = np.zeros((m, _KEYB), dtype=np.uint8)
    inside = pos <= n - _KEYB
    if inside.any():
        win = np.lib.stride_tricks.sliding_window_view(np.asarray(X), _KEYB)
        raw[inside] = win[pos[inside]]
    for i in np.nonzero(~inside)[0]:
        p = int(pos[i])
        raw[i, : n - p] = X[p:n]
    words = []
    for w in range(3):
        col = np.ascontiguousarray(raw[:, 8 * w: 8 * w + 8])
        words.append(col.view(">u8").reshape(m).astype(np.uint64))
    return words


class _Run:
    """One partial SA on disk + its loaded head."""

    def __init__(self, path: str, count: int):
        self.path = path
        self.count = count
        self.off = 0          # next unloaded entry
        self.pos = np.empty(0, dtype=np.int64)
        self.keys = [np.empty(0, dtype=np.uint64) for _ in range(3)]

    def load(self, X, want: int) -> None:
        take = min(want, self.count - self.off)
        if take <= 0:
            return
        raw = np.fromfile(self.path, dtype=np.uint8, count=5 * take,
                          offset=5 * self.off).reshape(take, 5)
        low = raw[:, 0:4].copy().view(np.uint32).reshape(take)
        new = (raw[:, 4].astype(np.int64) << 32) | low.astype(np.int64)
        self.off += take
        kw = _keys(X, new)
        self.pos = np.concatenate([self.pos, new])
        self.keys = [np.concatenate([a, b]) for a, b in zip(self.keys, kw)]

    def exhausted(self) -> bool:
        return self.off >= self.count

    def drop(self, k: int) -> None:
        self.pos = self.pos[k:]
        self.keys = [w[k:] for w in self.keys]


def _emit_sorted(X, pos, w0, w1, w2) -> np.ndarray:
    order = np.lexsort((w2, w1, w0))
    pos, w0, w1, w2 = pos[order], w0[order], w1[order], w2[order]
    eq = (w0[:-1] == w0[1:]) & (w1[:-1] == w1[1:]) & (w2[:-1] == w2[1:])
    if eq.any():
        pos = _repair_groups(X, pos, _equal_runs(eq))
    return pos


def sa_build_external(prefix: str, ram_bytes: int, margin: int = 4096,
                      tmpdir: str | None = None) -> None:
    """Build `<prefix>.sa5` with a ~ram_bytes-bounded working set.
    Output byte-identical to `sa_build` (the in-RAM path)."""
    assert margin >= 32
    X = np.memmap(prefix, dtype=np.uint8, mode="r")
    n = int(X.shape[0])
    block = max(4 * margin, int(ram_bytes // 12))
    td = tempfile.mkdtemp(prefix="lrm_sa_ext_", dir=tmpdir)
    runs = []
    try:
        for b in range(0, n, block):
            e = min(b + block, n)
            part = _block_sa(X, b, e, margin)
            path = os.path.join(td, f"part{b}.ui40")
            with Sa5Writer(path) as pw:   # 5-byte spill: 5/8 the disk+IO
                pw.append(part)
            runs.append(_Run(path, part.shape[0]))
            del part

        # Native streamed merge (samerge.cpp): exact suffix comparisons
        # against the mmap'd text, no repair stage, .sa5 written directly.
        # LRM_SA_MERGE=py forces the numpy path (parity tests / no-g++).
        if os.environ.get("LRM_SA_MERGE", "native") != "py":
            wrote = native.sa_merge_files(
                prefix, n, [r.path for r in runs],
                [r.count for r in runs], prefix + ".sa5")
            if wrote == n:
                return
            if wrote >= 0:
                raise RuntimeError(
                    f"native SA merge wrote {wrote} of {n} entries")
            # wrote < 0: library unavailable — numpy merge below

        hi64 = np.uint64(0xFFFFFFFFFFFFFFFF)
        # merge load granularity: fixed 32k MEASURED best — a budget-
        # scaled 1M chunk was 988 s vs 747 s at 500 Mchar/1 GB (bigger
        # lexsort batches + buffer drop copies outgrow the saved python
        # round overhead); don't re-raise without re-measuring
        with Sa5Writer(prefix + ".sa5") as out:
            while runs:
                want = _CHUNK
                while True:
                    for r in runs:
                        if r.pos.shape[0] < want // 2:
                            r.load(X, want)
                    # highest safely-emittable key: below the smallest
                    # last-loaded key of any run that still has unloaded
                    # entries (their unloaded keys are >= that key)
                    bound = hi64, hi64, hi64
                    for r in runs:
                        if not r.exhausted() and r.pos.shape[0]:
                            lk = (r.keys[0][-1], r.keys[1][-1],
                                  r.keys[2][-1])
                            bound = min(bound, lk)
                    cut = []
                    for r in runs:
                        if r.pos.shape[0] == 0:
                            cut.append(0)
                            continue
                        below = ((r.keys[0] < bound[0]) |
                                 ((r.keys[0] == bound[0]) &
                                  ((r.keys[1] < bound[1]) |
                                   ((r.keys[1] == bound[1]) &
                                    (r.keys[2] < bound[2])))))
                        cut.append(int(np.searchsorted(
                            ~below, True)) if below.shape[0] else 0)
                    if any(cut) or bound == (hi64, hi64, hi64):
                        break
                    want *= 2  # equal-key flood: widen the heads
                if bound == (hi64, hi64, hi64):
                    cut = [r.pos.shape[0] for r in runs]  # final flush
                pos = np.concatenate([r.pos[:c] for r, c in zip(runs, cut)])
                ws = [np.concatenate([r.keys[w][:c]
                                      for r, c in zip(runs, cut)])
                      for w in range(3)]
                if pos.shape[0]:
                    out.append(_emit_sorted(X, pos, *ws))
                for r, c in zip(runs, cut):
                    r.drop(c)
                runs = [r for r in runs
                        if r.pos.shape[0] or not r.exhausted()]
    finally:
        for f in os.listdir(td):
            os.unlink(os.path.join(td, f))
        os.rmdir(td)
