"""End-to-end golden test: full index build + device mapping pipeline vs the
pure-Python oracle transcription of the reference control flow — the
golden-SAM harness SURVEY.md §4 calls for (the reference itself only had
manual cluster runs)."""

import io
import os

import numpy as np
import pytest

from longreadmapper_tpu.formats.catmeta import create_meta, load_cat, load_mta
from longreadmapper_tpu.formats.lch import write_lch
from longreadmapper_tpu.index.device import build_device_index
from longreadmapper_tpu.index.fmi import FMIndex
from longreadmapper_tpu.index.lchash import lc_build_host
from longreadmapper_tpu.index.sa import sa_build
from longreadmapper_tpu.models.mapper import TPUMapper
from longreadmapper_tpu.oracle.refpipe import OracleMapper
from longreadmapper_tpu.utils.config import Params

from conftest import make_genome, sample_reads, write_fasta, write_fastq

HLEN = 6


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(21)
    genome = make_genome(rng, 24000, n_frac=0.01)
    fa = str(tmp / "ref.fa")
    write_fasta(fa, [("chrA", genome[:16000]), ("chrB", genome[16000:])])

    params = Params(hlen=HLEN, seed_len=20, thres=300, batch_size=64)
    create_meta(fa, n_seed=params.n_seed)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, o_ratio=params.o_ratio,
                        csa_ratio=params.csa_ratio, sa=sa)
    fmi.write(prefix)
    kl = lc_build_host(fmi, HLEN)
    write_lch(prefix + ".lch", HLEN, kl)

    cat = load_cat(prefix)
    mta = load_mta(fa + ".mta")
    idx, meta = build_device_index(fmi, kl, HLEN, cat, mta)
    mapper = TPUMapper(idx, meta, mta, params, chunk_b=16)
    oracle = OracleMapper(fmi, kl, HLEN, cat, mta, params)
    # reads sampled from the .cat forward halves so truth is known;
    # genome string for sampling = the N-replaced cat text of chrA fwd
    chrA = cat[:16000].tobytes().decode()
    chrB = cat[32000:40000].tobytes().decode()
    return dict(mapper=mapper, oracle=oracle, chrA=chrA, chrB=chrB,
                rng=rng, params=params, fa=fa)


def _compare(mapper, oracle, reads):
    recs = mapper.map_chunk([(n, s, "I" * len(s)) for n, s, *_ in reads])
    for (name, seq, *_), rec in zip(reads, recs):
        o = oracle.map_read(seq)
        assert rec.valid == o.valid, (name, rec, o)
        assert rec.flag == o.flag, (name, rec.flag, o.flag, o)
        assert rec.ed == o.ed, (name, rec.ed, o.ed)
        if o.found:
            assert rec.off == o.off, (name, rec.off, o.off)
            assert rec.rname == oracle.mta[o.gi].seq_name
        else:
            assert rec.rname == "*"
        assert rec.seq == o.seq_out, name
        if o.valid:
            from longreadmapper_tpu.formats.sam import cigar_string
            assert rec.cigar == cigar_string(o.cigar), (name, rec.cigar, o.cigar)
    return recs


def test_perfect_reads_map_exactly(pipeline):
    rng = np.random.default_rng(1)
    reads = sample_reads(rng, pipeline["chrA"], 12, 150, error_rate=0.0)
    recs = _compare(pipeline["mapper"], pipeline["oracle"], reads)
    n_valid = sum(r.valid for r in recs)
    assert n_valid >= 10  # nearly all perfect reads must map
    for (name, seq, pos, strand), rec in zip(reads, recs):
        if rec.valid:
            assert rec.rname == "chrA"
            assert rec.off == pos, (name, rec.off, pos)
            assert rec.flag == (16 if strand else 0)
            assert rec.ed == 0
            assert rec.cigar == "150M"


def test_noisy_reads_match_oracle(pipeline):
    rng = np.random.default_rng(2)
    reads = sample_reads(rng, pipeline["chrA"], 12, 200, error_rate=0.03)
    recs = _compare(pipeline["mapper"], pipeline["oracle"], reads)
    assert sum(r.valid for r in recs) >= 8


def test_second_contig_and_random_reads(pipeline):
    rng = np.random.default_rng(3)
    reads = sample_reads(rng, pipeline["chrB"], 6, 150, error_rate=0.02)
    # plus junk reads that map nowhere
    junk = [("junk%d" % i,
             "".join("ACGT"[c] for c in rng.integers(0, 4, 150)), None, 0)
            for i in range(4)]
    recs = _compare(pipeline["mapper"], pipeline["oracle"], reads + junk)
    for (name, *_), rec in zip(reads, recs[:6]):
        if rec.valid:
            assert rec.rname == "chrB"


def test_variable_length_chunk(pipeline):
    rng = np.random.default_rng(4)
    r1 = sample_reads(rng, pipeline["chrA"], 4, 80, error_rate=0.01)
    r2 = sample_reads(rng, pipeline["chrA"], 4, 230, error_rate=0.01)
    _compare(pipeline["mapper"], pipeline["oracle"], r1 + r2)


def test_sam_output_shape(pipeline):
    rng = np.random.default_rng(5)
    reads = sample_reads(rng, pipeline["chrA"], 4, 150, error_rate=0.0)
    recs = pipeline["mapper"].map_chunk(
        [(n, s, "I" * len(s)) for n, s, *_ in reads])
    for rec in recs:
        line = rec.to_sam()
        fields = line.rstrip("\n").split("\t")
        assert len(fields) == 12
        assert fields[6] == "*" and fields[7] == "0" and fields[8] == "0"
        assert fields[11].startswith("ED:I:")


def test_mapdist_single_process(pipeline, tmp_path, monkeypatch):
    """runtime/launch.run_distributed on one process == run_mapping output
    (stripe .part0 with header), exercising the multi-host code path."""
    import io
    from longreadmapper_tpu.runtime.launch import run_distributed
    from longreadmapper_tpu.runtime.accaln import run_mapping
    from conftest import sample_reads, write_fastq

    rng = np.random.default_rng(31)
    reads = sample_reads(rng, pipeline["chrA"], 8, 150, error_rate=0.01)
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, [(n, s, "I" * len(s)) for n, s, *_ in reads])
    fa = pipeline["fa"]
    buf = io.StringIO()
    v1, t1 = run_mapping(fa, fq, pipeline["params"], buf, rg_id=0,
                         verbose=False)
    prefix = str(tmp_path / "dist.sam")
    v2, t2 = run_distributed(fa, fq, pipeline["params"],
                             out_prefix=prefix, rg_id=0, verbose=False)
    assert (v1, t1) == (v2, t2)
    part = open(prefix + ".part0").read()
    assert part == buf.getvalue()


def test_repeat_heavy_seeds_match_oracle(tmp_path):
    """Seeds whose hlen-mer interval exceeds thres go through the LF-
    narrowing fallback (pipeline._narrow_wide_seeds); results must still
    match the oracle exactly, with no overflow flagged."""
    from longreadmapper_tpu.formats.catmeta import create_meta, load_cat, load_mta
    from longreadmapper_tpu.index.device import build_device_index
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.oracle.refpipe import OracleMapper
    from longreadmapper_tpu.utils.config import Params
    from longreadmapper_tpu.formats.sam import cigar_string

    rng = np.random.default_rng(77)
    rand = lambda k: "".join("ACGT"[c] for c in rng.integers(0, 4, k))
    # a 60-mer tandem-repeated 40x floods every k-mer inside it; with
    # thres=30 those seeds are "wide" (hits >= thres) on the device path
    motif = rand(60)
    genome = rand(8000) + motif * 40 + rand(8000)
    fa = str(tmp_path / "rep.fa")
    with open(fa, "w") as f:
        f.write(">rep\n")
        for i in range(0, len(genome), 70):
            f.write(genome[i:i + 70] + "\n")
    params = Params(hlen=6, thres=30, batch_size=64)
    mta = create_meta(fa, n_seed=0)
    sa = sa_build(fa + ".cat")
    fmi = FMIndex.build(fa + ".cat", sa=sa)
    kl = lc_build_from_sa(fmi.sa, encode_bytes(load_cat(fa + ".cat")), 6)
    idx, meta = build_device_index(fmi, kl, 6, load_cat(fa + ".cat"),
                                   load_mta(fa + ".mta"))
    mapper = TPUMapper(idx, meta, load_mta(fa + ".mta"), params, chunk_b=16)
    oracle = OracleMapper(fmi, kl, 6, load_cat(fa + ".cat"),
                          load_mta(fa + ".mta"), params)

    reads = []
    # reads straddling the repeat boundary + inside unique regions
    for i, p in enumerate([7900, 7950, 2000, 4000,
                           8000 + 60 * 40 - 50, 12000]):
        s = genome[p:p + 200]
        ch = np.frombuffer(s.encode(), np.uint8).copy()
        m = rng.random(200) < 0.02
        ch[m] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(m.sum()))]
        reads.append((f"rep{i}", ch.tobytes().decode(), None))

    recs = mapper.map_chunk(reads)
    assert mapper.overflow_reads == 0
    for (name, seq, _), rec in zip(reads, recs):
        o = oracle.map_read(seq)
        assert rec.valid == o.valid, name
        assert rec.ed == o.ed, name
        if o.found:
            assert rec.off == o.off, name
        if o.valid:
            assert rec.cigar == cigar_string(o.cigar), name
