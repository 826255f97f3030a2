"""Column-consuming traceback (ops/traceback.device_traceback_c).

The c-walk must decode to exactly the same merged CIGAR groups as the
per-word v-walk for every in-limit read — both follow the same stored
direction bits, so the paths are identical; only the run fragmentation
differs (the c-walk emits one entry per M-run instead of one byte per
16-row word fragment).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from longreadmapper_tpu.models.mapper import _rle_groups  # noqa: E402
from longreadmapper_tpu.ops.traceback import (  # noqa: E402
    device_traceback_c, device_traceback_v)
from longreadmapper_tpu.ops.wavefront import banded_nw_dirs_v  # noqa: E402


def _groups_per_read(runs, B, entry16):
    rows, ops, tot = _rle_groups(np.asarray(runs), entry16=entry16)
    out = [[] for _ in range(B)]
    for r, o, t in zip(rows.tolist(), ops.tolist(), tot.tolist()):
        out[r].append((t, o))
    return out


def _mutate(rng, q, n_sub, n_ind):
    t = list(q)
    for _ in range(n_sub):
        p = rng.integers(0, len(t))
        t[p] = (t[p] + 1 + rng.integers(0, 3)) % 4
    for _ in range(n_ind):
        p = int(rng.integers(1, len(t) - 1))
        if rng.random() < 0.5:
            del t[p]
        else:
            t.insert(p, int(rng.integers(0, 4)))
    return t


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cwalk_matches_vwalk(seed):
    rng = np.random.default_rng(seed)
    B, L, W = 16, 256, 24
    band = 128
    q = np.full((B, L), 4, np.int8)
    t = np.full((B, L), 5, np.int8)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(L // 2, L + 1))
        qb = rng.integers(0, 4, n)
        # heavy indel mix: up to ~W/2 edits so runs split often
        tb = _mutate(rng, list(qb), int(rng.integers(0, 6)),
                     int(rng.integers(0, W // 2)))
        tb = (tb + [5] * L)[:L]
        q[b, :n] = qb
        t[b, :len(tb)] = tb
        lens[b] = n
    lens[0] = 0                      # dead lane: must emit nothing

    vdirs, wcol, nm = banded_nw_dirs_v(jnp.asarray(q), jnp.asarray(t), W,
                                       band, with_nm=True)
    ed = np.asarray(wcol)[lens, np.arange(B)]
    # over-limit lanes masked off, like the pipeline does (the c-walk's
    # iteration bound covers in-limit paths only)
    lens_tb = np.where(ed <= W, lens, 0).astype(np.int32)
    rv = device_traceback_v(vdirs, jnp.asarray(lens_tb), L, W)
    rc = device_traceback_c(vdirs, jnp.asarray(lens_tb), L, W)
    rc2 = device_traceback_c(vdirs, jnp.asarray(lens_tb), L, W, nm=nm)
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(rc2))
    gv = _groups_per_read(rv, B, False)
    gc = _groups_per_read(rc, B, True)
    assert gc[0] == []
    for b in range(1, B):
        if ed[b] > W:                # over-limit: masked, no output
            assert gc[b] == []
            continue
        assert gc[b] == gv[b], (b, ed[b], gc[b], gv[b])


def test_cwalk_pure_match_single_iteration():
    """A perfect read walks in one M-run entry (plus padding)."""
    rng = np.random.default_rng(9)
    B, L, W, band = 4, 128, 16, 128
    q = rng.integers(0, 4, (B, L)).astype(np.int8)
    t = q.astype(np.int8)
    lens = np.full(B, L, np.int32)
    vdirs, _ = banded_nw_dirs_v(jnp.asarray(q), jnp.asarray(t), W, band)
    rc = device_traceback_c(vdirs, jnp.asarray(lens), L, W)
    g = _groups_per_read(rc, B, True)
    for b in range(B):
        assert g[b] == [(L, 0)]
