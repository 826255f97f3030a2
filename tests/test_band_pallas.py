"""Pallas band-DP kernel parity: ops/band_pallas.banded_nw_dirs_vt must be
bit-identical to ops/wavefront.banded_nw_dirs_v (transposed words), and the
run-consuming walk must accept the band-major layout unchanged.

Runs the kernel in interpret mode on the CPU backend; the real-TPU lowering
is exercised by bench.py / scripts/profile_map.py on the chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _codes(rng, B, L, n_pad=0):
    q = rng.integers(0, 4, (B, L)).astype(np.int8)
    if n_pad:
        q[:, L - n_pad:] = 4
    return q


def _mutate(rng, row, n_edits):
    """Apply n_edits random substitutions/1-indels to a code row (list)."""
    s = list(row)
    for _ in range(n_edits):
        k = rng.integers(0, 3)
        p = int(rng.integers(0, len(s)))
        if k == 0:
            s[p] = (s[p] + 1 + int(rng.integers(0, 3))) % 4
        elif k == 1 and len(s) > 4:
            del s[p]
        else:
            s.insert(p, int(rng.integers(0, 4)))
    return s


@pytest.mark.parametrize("B,L,W,band", [(4, 64, 16, 48), (3, 128, 24, 64)])
def test_dirs_vt_matches_xla(rng, B, L, W, band):
    from longreadmapper_tpu.ops.band_pallas import banded_nw_dirs_vt
    from longreadmapper_tpu.ops.wavefront import banded_nw_dirs_v

    # realistic rows: t = mutated q (so real M/I/D runs exist), plus pad
    q = _codes(rng, B, L)
    t = np.full((B, L), 5, np.int8)
    for b in range(B):
        s = _mutate(rng, list(q[b, : L - 8]), n_edits=6)[:L]
        t[b, : len(s)] = s
    q[:, L - 8:] = 4

    vdirs, wcol = banded_nw_dirs_v(jnp.asarray(q), jnp.asarray(t), W, band)
    vdirsT, wcolP = banded_nw_dirs_vt(jnp.asarray(q), jnp.asarray(t), W,
                                      band, interpret=True)
    np.testing.assert_array_equal(np.asarray(wcolP), np.asarray(wcol))
    np.testing.assert_array_equal(np.asarray(vdirsT),
                                  np.asarray(vdirs).transpose(0, 2, 1))


def test_walk_band_major(rng):
    """device_traceback_v(band_major=True) over the kernel's emission must
    yield the same run bytes as the row-major walk over XLA's."""
    from longreadmapper_tpu.ops.band_pallas import banded_nw_dirs_vt
    from longreadmapper_tpu.ops.traceback import device_traceback_v
    from longreadmapper_tpu.ops.wavefront import banded_nw_dirs_v

    B, L, W, band = 4, 64, 16, 48
    q = _codes(rng, B, L)
    t = np.full((B, L), 5, np.int8)
    lens = np.full(B, L, np.int32)
    for b in range(B):
        s = _mutate(rng, list(q[b]), n_edits=5)[:L]
        t[b, : len(s)] = s

    vdirs, _ = banded_nw_dirs_v(jnp.asarray(q), jnp.asarray(t), W, band)
    vdirsT, _ = banded_nw_dirs_vt(jnp.asarray(q), jnp.asarray(t), W, band,
                                  interpret=True)
    runs = device_traceback_v(vdirs, jnp.asarray(lens), L, W)
    runsT = device_traceback_v(vdirsT, jnp.asarray(lens), L, W,
                               band_major=True)
    np.testing.assert_array_equal(np.asarray(runsT), np.asarray(runs))
