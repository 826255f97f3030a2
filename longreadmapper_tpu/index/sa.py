"""Suffix-array build glue (reference: psascan/sa_use.cc:8-17 `sa_build`).

Builds the suffix array of the file at `prefix` (the .cat text) and writes it
as `<prefix>.sa5` in the 40-bit codec.  The construction itself is the native
SA-IS component (longreadmapper_tpu/native/sais.cpp) replacing pSAscan.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..formats.ui40 import write_sa5, read_sa5


def sa_build(prefix: str, ram_use: int = 0) -> np.ndarray:
    """Build and persist `<prefix>.sa5`; returns the SA as int64.

    `ram_use` is accepted for signature parity with the reference but unused:
    SA-IS here is in-RAM (external-memory blocks are future work, SURVEY.md §7).
    """
    text = np.fromfile(prefix, dtype=np.uint8)
    sa = native.suffix_array(text)
    write_sa5(sa, prefix + ".sa5")
    return sa


def sa_load(prefix: str) -> np.ndarray:
    """Load `<prefix>.sa5` whole (alnmain.c:242-252 behavior)."""
    return read_sa5(prefix + ".sa5")
