"""ctypes bindings for the native C++ components (SA-IS, banded traceback).

Compiled on first use with g++ into `_lrm_native.so` next to the sources;
rebuilt when any source is newer than the library.  Every entry point has a
pure-numpy fallback so the framework still functions (slowly) without a
toolchain — `HAVE_NATIVE` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_lrm_native.so")
_SOURCES = [os.path.join(_DIR, f)
            for f in ("sais.cpp", "align.cpp", "affine.cpp", "myers.cpp",
                      "samerge.cpp")]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False


def _build() -> bool:
    try:
        need = not os.path.exists(_SO) or any(
            os.path.getmtime(src) > os.path.getmtime(_SO) for src in _SOURCES
        )
        if need:
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-o", _SO + ".tmp", *_SOURCES]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, HAVE_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.lrm_sais_u8.restype = ctypes.c_int
        lib.lrm_sais_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lrm_traceback.restype = ctypes.c_int32
        lib.lrm_traceback.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.lrm_banded_align.restype = ctypes.c_int32
        lib.lrm_banded_align.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lrm_affine_align.restype = ctypes.c_int32
        lib.lrm_affine_align.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lrm_myers_distance.restype = ctypes.c_int
        lib.lrm_myers_distance.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lrm_sa_merge.restype = ctypes.c_int64
        lib.lrm_sa_merge.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.c_char_p,
        ]
        _lib = lib
        HAVE_NATIVE = True
        return _lib


def _as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 text (implicit smallest sentinel convention)."""
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = text.shape[0]
    lib = _load()
    if lib is not None:
        # n + 1 slots: at genome scale the native build runs in this
        # buffer (the extra slot is its sentinel scratch) instead of
        # doubling the footprint with an internal copy
        sa = np.empty(n + 1, dtype=np.int64)
        rc = lib.lrm_sais_u8(_as_u8_ptr(text), n,
                             sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc == 0:
            return sa[:n]
    return _suffix_array_numpy(text)


def _suffix_array_numpy(text: np.ndarray) -> np.ndarray:
    """O(n log^2 n) prefix-doubling fallback via np.lexsort."""
    n = text.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = text.astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # second key: rank[i+k], -1 past the end (sentinel = smallest)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        key1 = rank[order]
        key2 = second[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (np.diff(key1) != 0) | (np.diff(key2) != 0)
        tmp[order] = np.cumsum(changed)
        rank, tmp = tmp, rank
        sa = order
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return sa.astype(np.int64)


def traceback(H: np.ndarray, W: int, q: np.ndarray, t: np.ndarray,
              qlen: int, tlen: int) -> Optional[List[Tuple[int, str]]]:
    """CIGAR traceback over a banded H matrix ((qlen+1, band) int16).

    Returns [(count, op), ...] or None if no in-band path exists.
    """
    H = np.ascontiguousarray(H, dtype=np.int16)
    band = H.shape[1]
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    lib = _load()
    max_ops = 2 * (qlen + tlen) + 4
    if lib is not None:
        ops = np.empty(max_ops, dtype=np.uint8)
        lens = np.empty(max_ops, dtype=np.int32)
        n = lib.lrm_traceback(
            H.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), band, W,
            _as_u8_ptr(q), _as_u8_ptr(t), qlen, tlen,
            _as_u8_ptr(ops), lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_ops)
        if n < 0:
            return None
        return [(int(lens[i]), chr(ops[i])) for i in range(n)]
    return _traceback_py(H, W, q, t, qlen, tlen)


INF16 = 0x3FFF


def _traceback_py(H, W, q, t, qlen, tlen):
    band = H.shape[1]
    i, j = qlen, tlen
    d = j - i + W
    if d < 0 or d >= band or H[i, d] >= INF16:
        return None
    rev = []
    while i > 0 or j > 0:
        cur = H[i, d]
        if (i > 0 and j > 0 and H[i - 1, d] < INF16
                and H[i - 1, d] + (1 if q[i - 1] != t[j - 1] else 0) == cur):
            rev.append("M"); i -= 1; j -= 1
        elif i > 0 and d + 1 < band and H[i - 1, d + 1] + 1 == cur:
            rev.append("I"); i -= 1; d += 1
        elif j > 0 and d - 1 >= 0 and H[i, d - 1] + 1 == cur:
            rev.append("D"); j -= 1; d -= 1
        else:
            return None
    ops: List[Tuple[int, str]] = []
    for op in reversed(rev):
        if ops and ops[-1][1] == op:
            ops[-1] = (ops[-1][0] + 1, op)
        else:
            ops.append((1, op))
    return ops


def banded_align(q: np.ndarray, t: np.ndarray, W: int):
    """CPU banded NW: returns (ed, ops) with ed=-1/ops=None when out-of-band."""
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    qlen, tlen = q.shape[0], t.shape[0]
    lib = _load()
    if lib is not None:
        max_ops = 2 * (qlen + tlen) + 4
        ops = np.empty(max_ops, dtype=np.uint8)
        lens = np.empty(max_ops, dtype=np.int32)
        ed = ctypes.c_int32(-1)
        n = lib.lrm_banded_align(
            _as_u8_ptr(q), qlen, _as_u8_ptr(t), tlen, W,
            _as_u8_ptr(ops), lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_ops, ctypes.byref(ed))
        if ed.value < 0:
            return -1, None
        return int(ed.value), [(int(lens[i]), chr(ops[i])) for i in range(n)]
    return _banded_align_py(q, t, W)


def _banded_align_py(q, t, W):
    qlen, tlen = q.shape[0], t.shape[0]
    band = 2 * W + 1
    H = np.full((qlen + 1, band), INF16, dtype=np.int16)
    for d in range(W, band):
        j = d - W
        if j <= tlen:
            H[0, d] = j
    for i in range(1, qlen + 1):
        for d in range(band):
            j = i + d - W
            if j < 0 or j > tlen:
                continue
            if j == 0:
                H[i, d] = i
                continue
            best = INF16
            if H[i - 1, d] < INF16:
                best = min(best, H[i - 1, d] + (1 if q[i - 1] != t[j - 1] else 0))
            if d + 1 < band and H[i - 1, d + 1] < INF16:
                best = min(best, H[i - 1, d + 1] + 1)
            if d - 1 >= 0 and H[i, d - 1] < INF16:
                best = min(best, H[i, d - 1] + 1)
            H[i, d] = best
    d_end = tlen - qlen + W
    if d_end < 0 or d_end >= band or H[qlen, d_end] >= INF16:
        return -1, None
    ops = _traceback_py(H, W, q, t, qlen, tlen)
    if ops is None:
        return -1, None
    return int(H[qlen, d_end]), ops


def affine_align(q: np.ndarray, t: np.ndarray, W: int, match: int = 2,
                 mismatch: int = -2, gap_open: int = 3, gap_ext: int = 1):
    """Banded affine-gap local alignment with CIGAR — the `compute_cigar`
    equivalent (reference ssw_use.c:27-54 parameters by default).

    Returns (score, (q_beg, q_end, t_beg, t_end), ops) with 0-based
    half-open coordinates, or (0, None, None) when nothing scores > 0.
    Falls back to a numpy DP without the native library.
    """
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        max_ops = 2 * (q.shape[0] + t.shape[0]) + 4
        ops = np.empty(max_ops, dtype=np.uint8)
        lens = np.empty(max_ops, dtype=np.int32)
        out5 = np.zeros(5, dtype=np.int32)
        n = lib.lrm_affine_align(
            _as_u8_ptr(q), q.shape[0], _as_u8_ptr(t), t.shape[0], W,
            match, mismatch, gap_open, gap_ext,
            _as_u8_ptr(ops),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_ops,
            out5.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            return 0, None, None
        return (int(out5[0]), tuple(int(x) for x in out5[1:5]),
                [(int(lens[i]), chr(ops[i])) for i in range(n)])
    return _affine_align_py(q, t, W, match, mismatch, gap_open, gap_ext)


def _affine_align_py(q, t, W, match, mismatch, gap_open, gap_ext):
    qlen, tlen = q.shape[0], t.shape[0]
    band = 2 * W + 1
    NEGI = -(1 << 28)
    oe = gap_open + gap_ext
    H = np.zeros((qlen + 1, band), np.int32)
    E = np.full((qlen + 1, band), NEGI, np.int32)
    F = np.full((qlen + 1, band), NEGI, np.int32)
    best, bi, bj = 0, 0, 0
    for i in range(1, qlen + 1):
        for d in range(band):
            j = i + d - W
            if j < 1 or j > tlen:
                continue
            hup = H[i - 1, d + 1] if d + 1 < band else NEGI
            fup = F[i - 1, d + 1] if d + 1 < band else NEGI
            f = max(hup - oe, fup - gap_ext)
            hl = H[i, d - 1] if d >= 1 else NEGI
            el = E[i, d - 1] if d >= 1 else NEGI
            e = max(hl - oe, el - gap_ext)
            s = (match if q[i - 1] == t[j - 1] else mismatch) \
                if q[i - 1] < 4 and t[j - 1] < 4 else 0
            h = max(0, H[i - 1, d] + s, e, f)
            H[i, d], E[i, d], F[i, d] = h, e, f
            if h > best:
                best, bi, bj = h, i, j
    if best <= 0:
        return 0, None, None
    i, j, state, rev = bi, bj, 0, []
    while i > 0 and j > 0:
        d = j - i + W
        if state == 0:
            if H[i, d] == 0:
                break
            s = (match if q[i - 1] == t[j - 1] else mismatch) \
                if q[i - 1] < 4 and t[j - 1] < 4 else 0
            if H[i - 1, d] + s == H[i, d]:
                rev.append("M"); i -= 1; j -= 1
            elif F[i, d] == H[i, d]:
                state = 2
            else:
                state = 1
        elif state == 1:
            rev.append("D")
            hl = H[i, d - 1] if d >= 1 else NEGI
            state = 0 if hl - oe == E[i, d] else 1
            j -= 1
        else:
            rev.append("I")
            hup = H[i - 1, d + 1] if d + 1 < band else NEGI
            state = 0 if hup - oe == F[i, d] else 2
            i -= 1
    ops: List[Tuple[int, str]] = []
    for op in reversed(rev):
        if ops and ops[-1][1] == op:
            ops[-1] = (ops[-1][0] + 1, op)
        else:
            ops.append((1, op))
    return best, (i, bi, j, bj), ops


def myers_distance(q: np.ndarray, t: np.ndarray, mode: str = "NW",
                   k: int = -1) -> Tuple[int, int]:
    """Myers bit-parallel edit distance (the edlib-equivalent scorer).

    mode: 'NW' (global), 'SHW' (free target suffix), 'HW' (free target
    prefix and suffix).  Returns (distance, end) — end = 1-based target
    position where the best alignment ends (n for NW).

    k >= 0 bounds the search (edlib.h:225's k): blocks provably > k are
    skipped and the scan aborts early once no <= k outcome is reachable;
    returns (-1, 0) when the distance exceeds k.
    """
    modes = {"NW": 0, "SHW": 1, "HW": 2}
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out2 = np.zeros(2, dtype=np.int64)
        lib.lrm_myers_distance(
            _as_u8_ptr(q), q.shape[0], _as_u8_ptr(t), t.shape[0],
            modes[mode], k,
            out2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return int(out2[0]), int(out2[1])
    return _myers_py(q, t, modes[mode], k)


def _myers_py(q, t, mode, k=-1):
    m, n = q.shape[0], t.shape[0]
    kb = k if k >= 0 else None
    if m == 0:
        d, pos = ((n, n) if mode == 0 else (0, 0))
        return (-1, 0) if kb is not None and d > kb else (d, pos)
    prev = np.arange(m + 1, dtype=np.int64)
    best, pos = prev[m], 0
    for j in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = j if mode != 2 else 0
        sub = np.where((q < 4) & (q == t[j - 1]), 0, 1)
        for i in range(1, m + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + sub[i - 1])
        prev = cur
        if mode != 0 and cur[m] < best:
            best, pos = cur[m], j
        if kb is not None:
            # the last-row score moves by at most 1 per remaining column
            reach = cur[m] - (n - j)
            if (reach if mode == 0 else min(best, reach)) > kb:
                return -1, 0
    d = int(prev[m]) if mode == 0 else int(best)
    pos = n if mode == 0 else pos
    return (-1, 0) if kb is not None and d > kb else (d, pos)


def ops_extended(q: np.ndarray, t: np.ndarray, t_start: int,
                 ops: List[Tuple[int, str]]) -> List[Tuple[int, str]]:
    """Split M runs into '='/'X' runs by walking the path against the
    sequences — the EDLIB_CIGAR_EXTENDED format
    (/root/reference/edlib/edlib.h:249 `edlibAlignmentToCigar`).  N (code
    >= 4) never counts as a match, mirroring the scorer's Peq build."""
    out: List[Tuple[int, str]] = []

    def push(ln, op):
        if ln == 0:
            return
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + ln, op)
        else:
            out.append((ln, op))

    i, j = 0, t_start
    for ln, op in ops:
        if op == "I":
            push(ln, "I")
            i += ln
        elif op == "D":
            push(ln, "D")
            j += ln
        else:  # M: compare base by base, run-length the =/X stretches
            eq = (q[i:i + ln] == t[j:j + ln]) & (q[i:i + ln] < 4)
            s = 0
            for e in range(1, ln + 1):
                if e == ln or eq[e] != eq[s]:
                    push(e - s, "=" if eq[s] else "X")
                    s = e
            i += ln
            j += ln
    return out


def myers_align(q: np.ndarray, t: np.ndarray, mode: str = "HW",
                k: int = -1, extended: bool = False):
    """edlib-equivalent alignment with PATH: (distance, t_start, t_end, ops).

    The reference vendors edlib as its fallback/rescoring aligner
    (/root/reference/edlib/edlib.h:225 `edlibAlign`, :249
    `edlibAlignmentToCigar`); round 1 shipped DISTANCE+LOC only.  This adds
    the TASK_PATH equivalent for all three modes:

      NW  — global: window is all of t.
      SHW — free target suffix: end located by the bit-parallel scorer.
      HW  — infix: end from the HW scorer, start by rescoring the REVERSED
            pair in SHW mode over t[:end] (the standard edlib technique),
            then the located window aligns globally.

    The window path comes from the banded global aligner with half-width
    distance+1 (any optimal unit-cost path deviates from the window
    diagonal by at most the distance), so path cost always equals the
    bit-parallel distance; tie-break among co-optimal paths is this
    framework's M>I>D order (edlib's exact tie order is not replicated —
    documented divergence, any optimal path is a valid PATH result).

    Returns (distance, t_start, t_end, ops) with the 0-based half-open
    target window [t_start, t_end) and run-length ops [(len, op), ...]
    covering q (ops is [] for an empty query).

    k >= 0 bounds the search (edlib's k): returns (-1, 0, 0, []) when the
    distance exceeds k.  extended=True emits '='/'X' runs instead of 'M'
    (EDLIB_CIGAR_EXTENDED, edlib.h:249).
    """
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    m, n = q.shape[0], t.shape[0]
    if m == 0:
        if mode == "NW":
            if 0 <= k < n:
                return -1, 0, 0, []
            return n, 0, n, ([(n, "D")] if n else [])
        return 0, 0, 0, []
    ed, end = myers_distance(q, t, mode, k)
    if ed < 0:
        return -1, 0, 0, []
    if mode == "NW":
        start, end = 0, n
    elif mode == "SHW":
        start = 0
    else:  # HW: locate the window start on the reversed pair
        ed2, end2 = myers_distance(q[::-1], t[:end][::-1], "SHW")
        assert ed2 == ed, (ed, ed2)
        start = end - end2
    W = max(ed + 1, abs((end - start) - m) + 1)
    ed_b, ops = banded_align(q, t[start:end], W)
    assert ed_b == ed, (ed, ed_b, mode)
    if extended:
        ops = ops_extended(q, t, start, ops)
    return ed, start, end, ops


def sa_merge_files(text_path: str, n: int, part_paths: List[str],
                   counts: List[int], out_path: str) -> int:
    """Native K-way exact merge of partial-SA files into `<out_path>`
    (.sa5 codec) — the streamed pSAscan merge stage
    (/root/reference/psascan/src/psascan_src/merge.h:57+).  Returns the
    entry count written, or -1 when the native library is unavailable or
    the merge failed (callers fall back to the numpy merge)."""
    lib = _load()
    if lib is None:
        return -1
    k = len(part_paths)
    arr = (ctypes.c_char_p * k)(*[p.encode() for p in part_paths])
    cnt = (ctypes.c_int64 * k)(*[int(c) for c in counts])
    return int(lib.lrm_sa_merge(text_path.encode(), n, arr, cnt, k,
                                out_path.encode()))
