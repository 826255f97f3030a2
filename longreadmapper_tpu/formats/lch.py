""".lch lchash table serialization, byte-compatible with the reference.

Layout (/root/reference/lchash/lchash.c:106-127):
  hlen   int32
  len    u64            (= 2 * 4^hlen)
  table  len x u64      interleaved (k, l) SA-interval pairs; (0,0) = absent
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def write_lch(path: str, hlen: int, kl: np.ndarray) -> None:
    """`kl` is (4^hlen, 2) — rows are (k, l) pairs."""
    kl = np.asarray(kl, dtype="<u8")
    assert kl.shape == (1 << (2 * hlen), 2), kl.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<i", hlen))
        f.write(struct.pack("<Q", kl.size))
        f.write(kl.tobytes())  # row-major == interleaved k,l


def read_lch(path: str) -> Tuple[int, np.ndarray]:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<i", f.read(4))
        (length,) = struct.unpack("<Q", f.read(8))
        kl = np.frombuffer(f.read(length * 8), dtype="<u8").copy().reshape(-1, 2)
    return hlen, kl
