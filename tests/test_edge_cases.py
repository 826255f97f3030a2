"""Robustness edge cases the reference handles implicitly (or as UB, with
our documented defined behavior): tiny reads, N-rich reads, contig-boundary
candidates, empty inputs."""

import numpy as np
import pytest

from longreadmapper_tpu.formats.catmeta import create_meta, load_cat, load_mta
from longreadmapper_tpu.index.device import build_device_index
from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
from longreadmapper_tpu.index.lchash import lc_build_from_sa
from longreadmapper_tpu.index.sa import sa_build
from longreadmapper_tpu.models.mapper import TPUMapper
from longreadmapper_tpu.utils.config import Params

from conftest import make_genome, write_fasta

HLEN = 5


@pytest.fixture(scope="module")
def small_mapper(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("edge")
    rng = np.random.default_rng(3)
    genome = make_genome(rng, 9000)
    fa = str(tmp / "e.fa")
    write_fasta(fa, [("cA", genome[:5000]), ("cB", genome[5000:])])
    params = Params(hlen=HLEN)
    mta = create_meta(fa, n_seed=0)
    sa = sa_build(fa + ".cat")
    fmi = FMIndex.build(fa + ".cat", sa=sa)
    kl = lc_build_from_sa(fmi.sa, encode_bytes(load_cat(fa + ".cat")), HLEN)
    idx, meta = build_device_index(fmi, kl, HLEN, load_cat(fa + ".cat"),
                                   load_mta(fa + ".mta"))
    cat = load_cat(fa + ".cat")
    return (TPUMapper(idx, meta, load_mta(fa + ".mta"), params, chunk_b=8),
            cat)


def test_reads_shorter_than_seed(small_mapper):
    mapper, cat = small_mapper
    recs = mapper.map_chunk([("tiny", "ACGTACGTAC", None),
                             ("one", "A", None)])
    assert len(recs) == 2        # no crash; flags are defined behavior
    for r in recs:
        assert r.flag in (0, 4, 16)


def test_all_n_read(small_mapper):
    mapper, cat = small_mapper
    recs = mapper.map_chunk([("nn", "N" * 150, None)])
    assert len(recs) == 1
    assert not recs[0].valid
    assert recs[0].flag == 4 and recs[0].cigar == "*"


def test_mixed_n_read_still_maps(small_mapper):
    mapper, cat = small_mapper
    seq = cat[100:250].tobytes().decode()
    noisy = seq[:40] + "NNNNN" + seq[45:]
    recs = mapper.map_chunk([("mx", noisy, None)])
    assert len(recs) == 1
    # Ns never match (they cost edits) but seeding from clean stretches
    # should still locate it
    if recs[0].valid:
        assert recs[0].rname == "cA"
        assert abs(recs[0].off - 100) <= 5


def test_empty_chunk(small_mapper):
    mapper, cat = small_mapper
    assert mapper.map_chunk([]) == []


def test_contig_boundary_read_unmapped(small_mapper):
    """A read spanning the cA/cB join exists in .cat but in no single
    contig: seq_lookup must reject it (alnmain.c:151-176 containment)."""
    mapper, cat = small_mapper
    span = cat[4950:5050]        # fwd half of cA ends at 5000... in .cat
    # NOTE: .cat layout is cA fwd+rev then cB fwd+rev; position 5000 in
    # the FASTA is NOT the .cat boundary — construct from the .cat itself:
    # cA block is [0, 10000) (fwd+rev), cB starts at 10000.
    join = cat[9950:10050].tobytes().decode()
    recs = mapper.map_chunk([("join", join, None)])
    assert len(recs) == 1
    # either unmapped (containment fails) or mapped fully inside one half
    if recs[0].valid:
        assert recs[0].flag in (0, 16)


def test_sam_record_structural_validity(small_mapper):
    """Valid records must be internally consistent: CIGAR consumes exactly
    len(SEQ) query bases, POS+target-span stays inside the contig, flags
    legal — the structural invariants a SAM consumer relies on."""
    import re
    mapper, cat = small_mapper
    rng = np.random.default_rng(9)
    reads = []
    src = cat[:5000].tobytes().decode()
    for i in range(8):
        p = int(rng.integers(0, len(src) - 220))
        s = src[p:p + 200]
        ch = np.frombuffer(s.encode(), np.uint8).copy()
        m = rng.random(200) < 0.03
        ch[m] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(m.sum()))]
        reads.append((f"v{i}", ch.tobytes().decode(), "I" * 200))
    recs = mapper.map_chunk(reads)
    contig_len = {m.seq_name: m.seq_len for m in mapper.mta}
    for rec in recs:
        line = rec.to_sam().rstrip("\n").split("\t")
        assert len(line) == 12
        flag = int(line[1])
        assert flag in (0, 4, 16)
        if not rec.valid:
            assert line[5] == "*"
            continue
        ops = re.findall(r"(\d+)([MID])", rec.cigar)
        assert "".join(f"{c}{o}" for c, o in ops) == rec.cigar
        qlen = sum(int(c) for c, o in ops if o in "MI")
        tlen = sum(int(c) for c, o in ops if o in "MD")
        assert qlen == len(rec.seq)
        assert rec.off + tlen <= contig_len[rec.rname]


def test_many_contigs(tmp_path):
    """Dozens of contigs: seq_lookup containment and naming stay correct."""
    from longreadmapper_tpu.formats.catmeta import create_meta, load_cat, load_mta
    from longreadmapper_tpu.index.device import build_device_index
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(12)
    contigs = []
    for i in range(32):
        contigs.append((f"ctg{i:02d}",
                        "".join("ACGT"[c] for c in rng.integers(0, 4, 600))))
    fa = str(tmp_path / "m.fa")
    write_fasta(fa, contigs)
    params = Params(hlen=HLEN)
    mta = create_meta(fa, n_seed=0)
    sa = sa_build(fa + ".cat")
    fmi = FMIndex.build(fa + ".cat", sa=sa)
    kl = lc_build_from_sa(fmi.sa, encode_bytes(load_cat(fa + ".cat")), HLEN)
    idx, meta = build_device_index(fmi, kl, HLEN, load_cat(fa + ".cat"),
                                   load_mta(fa + ".mta"))
    mapper = TPUMapper(idx, meta, load_mta(fa + ".mta"), params, chunk_b=8)
    # one perfect read from contig 0, 17, 31
    reads = [(f"q{k}", contigs[k][1][100:280], None) for k in (0, 17, 31)]
    recs = mapper.map_chunk(reads)
    for (name, _, _), rec, k in zip(reads, recs, (0, 17, 31)):
        assert rec.valid, name
        assert rec.rname == f"ctg{k:02d}"
        assert rec.off == 100
        assert rec.ed == 0
