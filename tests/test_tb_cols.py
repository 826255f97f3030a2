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
    rows, ops, tot = _rle_groups(np.asarray(runs),
                                 entry_bytes=2 if entry16 else 1)
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


def test_short_band_override_matches_full(tmp_path, monkeypatch):
    """LRM_SHORT_BAND=<W'> narrow-band first pass on the short-read path:
    reads with ed >= W' (here ~7% error vs W'=63) must flag bit 2 and
    re-run through the full-band tier; results identical to default."""
    import numpy as np
    from longreadmapper_tpu.formats.catmeta import (create_meta, load_cat,
                                                    load_mta)
    from longreadmapper_tpu.index.device import build_device_index
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(13)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 60000))
    fa = str(tmp_path / "g.fa")
    with open(fa, "w") as f:
        f.write(">c1\n")
        for i in range(0, len(genome), 70):
            f.write(genome[i:i + 70] + "\n")
    params = Params(hlen=6)
    mta = create_meta(fa, n_seed=0)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, sa=sa)
    kl = lc_build_from_sa(fmi.sa, encode_bytes(load_cat(prefix)), 6)
    idx, meta = build_device_index(fmi, kl, 6, load_cat(prefix),
                                   load_mta(fa + ".mta"))
    mta_l = load_mta(fa + ".mta")

    reads = []
    for i in range(8):
        p = int(rng.integers(0, len(genome) - 1000))
        ch = np.frombuffer(genome[p:p + 1000].encode(), np.uint8).copy()
        err = 0.10 if i % 2 else 0.02  # ~7.5% effective (same-base
        # draws are no-ops) -> ed ~ 75 +- 8 crosses W'=63; limit 100
        m = rng.random(1000) < err
        ch[m] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(m.sum()))]
        reads.append((f"n{i}", ch.tobytes().decode(), None))

    m_full = TPUMapper(idx, meta, mta_l, params, chunk_b=8)
    recs_full = m_full.map_chunk(reads)

    monkeypatch.setenv("LRM_SHORT_BAND", "63")
    m_nar = TPUMapper(idx, meta, mta_l, params, chunk_b=8)
    cfg, _ = m_nar._step_for(1024)
    assert cfg.short_W == 63 and cfg.short_band == 128 and cfg.band == 256
    recs_nar = m_nar.map_chunk(reads)
    assert m_nar.retried_reads > 0
    assert m_nar.overflow_reads == 0
    for rf, rn in zip(recs_full, recs_nar):
        assert rn.valid == rf.valid
        assert rn.ed == rf.ed and rn.off == rf.off
        assert rn.cigar == rf.cigar
