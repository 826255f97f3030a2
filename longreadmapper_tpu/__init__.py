"""longreadmapper_tpu — a TPU-native long-read DNA mapping framework.

A from-scratch JAX/XLA/Pallas re-realization of the capabilities of
lisanhu/LongReadMapper (AccSeqV9): reference preprocessing, suffix-array /
FM-index / lchash seed-table construction, batched exact-match seeding via BWT
backward search, histogram diagonal voting, banded (GACT-style) tiled
alignment, and SAM emission — designed for TPU hardware (HBM-resident index,
vectorized gathers, anti-diagonal wavefront kernels, shard_map data
parallelism) rather than ported from the reference's CPU design.

Reference behavior contracts are cited per-module as /root/reference/<file>:<line>.
"""

import os

# The index and voting paths need 64-bit integers in a few places (vote score
# packing, genome-scale positions).  Everything hot is explicitly int32; x64
# only widens Python-scalar defaults, which we never rely on.
os.environ.setdefault("JAX_ENABLE_X64", "True")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

# Base encoding used throughout the framework: A=0 C=1 G=2 T=3, anything else
# (N, ...) = 4.  The on-disk ".cat" text additionally contains a final '$'
# terminator (reference: asindex.c:108-110) which device layouts encode via an
# explicit dollar position scalar.
A, C, G, T, NBASE = 0, 1, 2, 3, 4
