"""Packed slot layout (LRM_SLOT_PACK): pack=2/4 must produce IDENTICAL
mapping records to the flat layout — the vote set and order are unchanged
(seed-major, SA-rank-minor); only the gather geometry differs (CS rows of
pk adjacent sa_ctx entries instead of CS*? single rows).  Covers the owns
assignment path, the sort path (long reads), the slim layout, and the
overflow->retry interaction on a repeat-heavy genome."""

import numpy as np
import pytest

from longreadmapper_tpu.formats.catmeta import create_meta, load_cat, load_mta
from longreadmapper_tpu.formats.lch import write_lch
from longreadmapper_tpu.index.device import build_device_index
from longreadmapper_tpu.index.fmi import FMIndex
from longreadmapper_tpu.index.lchash import lc_build_host
from longreadmapper_tpu.index.sa import sa_build
from longreadmapper_tpu.models.mapper import TPUMapper
from longreadmapper_tpu.utils.config import Params

from conftest import make_genome, sample_reads, write_fasta

HLEN = 6


def _recs_equal(ra, rb, tag):
    assert len(ra) == len(rb)
    for a, b in zip(ra, rb):
        assert (a.valid, a.flag, a.ed, a.off, a.rname, a.cigar, a.seq) == \
               (b.valid, b.flag, b.ed, b.off, b.rname, b.cigar, b.seq), \
            (tag, a.qname, a, b)


def _build(tmp, genome, slim=False):
    fa = str(tmp / "ref.fa")
    write_fasta(fa, [("c1", genome)])
    params = Params(hlen=HLEN, seed_len=20, thres=300, batch_size=64)
    create_meta(fa, n_seed=params.n_seed)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, o_ratio=params.o_ratio,
                        csa_ratio=params.csa_ratio, sa=sa)
    fmi.write(prefix)
    kl = lc_build_host(fmi, HLEN)
    write_lch(prefix + ".lch", HLEN, kl)
    idx, meta = build_device_index(fmi, kl, HLEN, load_cat(prefix),
                                   load_mta(fa + ".mta"), slim=slim)
    return idx, meta, load_mta(fa + ".mta"), params


def _map_with_pack(monkeypatch, idx, meta, mta, params, reads, pack,
                   chunk_b=32):
    if pack == 1:
        monkeypatch.delenv("LRM_SLOT_PACK", raising=False)
    else:
        monkeypatch.setenv("LRM_SLOT_PACK", str(pack))
    m = TPUMapper(idx, meta, mta, params, chunk_b=chunk_b)
    recs = m.map_chunk([(n, s, None) for n, s, *_ in reads])
    return recs, m


@pytest.mark.parametrize("pack", [2, 4])
def test_pack_matches_flat_short_reads(tmp_path, monkeypatch, pack):
    rng = np.random.default_rng(77)
    genome = make_genome(rng, 30000)
    idx, meta, mta, params = _build(tmp_path, genome)
    reads = sample_reads(rng, genome, 24, 400, error_rate=0.05)
    r1, _ = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 1)
    rp, mp = _map_with_pack(monkeypatch, idx, meta, mta, params, reads,
                            pack)
    # the compiled step really used the packed layout
    (cfgp, _), = mp._steps.values()
    assert cfgp.pack == pack and cfgp.slot_rows < cfgp.vote_slots * pack
    _recs_equal(r1, rp, f"pack={pack}")
    assert sum(r.valid for r in r1) >= 20


def test_pack_matches_flat_slim_layout(tmp_path, monkeypatch):
    rng = np.random.default_rng(78)
    genome = make_genome(rng, 30000)
    idx, meta, mta, params = _build(tmp_path, genome, slim=True)
    reads = sample_reads(rng, genome, 16, 400, error_rate=0.04)
    r1, _ = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 1)
    r2, _ = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 2)
    _recs_equal(r1, r2, "slim-pack2")


def test_pack_long_read_sort_path(tmp_path, monkeypatch):
    """Reads in a gact bucket route slot assignment through
    _slots_by_sort — the packed layout must forward extras through the
    sorts identically."""
    rng = np.random.default_rng(79)
    genome = make_genome(rng, 40000)
    idx, meta, mta, params = _build(tmp_path, genome)
    reads = []
    for i in range(4):
        p = int(rng.integers(0, len(genome) - 2600))
        s = list(genome[p:p + 2600])
        for _ in range(40):
            j = int(rng.integers(0, 2600))
            s[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"lr{i}", "".join(s)))
    r1, _ = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 1,
                           chunk_b=4)
    monkeypatch.setenv("LRM_MID_DIRS_BUDGET", "0")   # force the gact path
    r2, m2 = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 2,
                            chunk_b=4)
    (cfg2, _), = m2._steps.values()
    assert cfg2.use_gact
    _recs_equal(r1, r2, "gact-pack2")
    assert all(r.valid for r in r1)


def test_pack_overflow_retry_parity(tmp_path, monkeypatch):
    """Repeat-heavy genome: packed-unit budgets overflow (possibly on
    different reads than the flat layout) and the exact-slots retry tier
    (always flat) restores identical results."""
    rng = np.random.default_rng(80)
    motif = make_genome(rng, 60)
    parts, pos = [], 0
    while pos < 20000:
        if rng.random() < 0.45:
            parts.append(motif)
            pos += len(motif)
        else:
            parts.append(make_genome(rng, 200))
            pos += 200
    genome = "".join(parts)
    idx, meta, mta, params = _build(tmp_path, genome)
    reads = sample_reads(rng, genome, 24, 400, error_rate=0.03)
    r1, m1 = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 1)
    r2, m2 = _map_with_pack(monkeypatch, idx, meta, mta, params, reads, 2)
    _recs_equal(r1, r2, "repeat-pack2")
    assert sum(r.valid for r in r1) >= 20
