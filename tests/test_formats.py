"""Format-layer tests: ui40 codec, .mta/.cat creation, fastx parsing, .mfi/.lch
round-trips — re-creating the reference's test strategy (SURVEY.md §4:
test/test-ui40read.cc, test/test-fmidx.cc serialization round-trip)."""

import gzip
import os

import numpy as np
import pytest

from longreadmapper_tpu.formats import (
    MtaEntry, create_meta, load_mta, read_fastx, read_sa5, write_sa5,
)
from longreadmapper_tpu.formats.catmeta import load_cat
from longreadmapper_tpu.utils.rng import Lcg48

from conftest import make_genome, write_fasta, write_fastq, sample_reads


def test_ui40_roundtrip(tmp_path):
    # layout parity: 5 bytes/entry, u32 low + u8 high, little-endian
    # (reference test/test-ui40read.cc:12-57)
    vals = np.array([0, 1, 0xFFFFFFFF, 0x1_0000_0000, 0xFF_FFFF_FFFF, 12345678901],
                    dtype=np.uint64)
    p = str(tmp_path / "x.sa5")
    write_sa5(vals, p)
    raw = np.fromfile(p, dtype=np.uint8)
    assert raw.shape[0] == 5 * len(vals)
    # entry 3 = 2^32 -> low word 0, high byte 1
    assert list(raw[15:20]) == [0, 0, 0, 0, 1]
    back = read_sa5(p)
    assert np.array_equal(back.astype(np.uint64), vals)


def test_fastx_fasta_multiline(tmp_path):
    p = str(tmp_path / "g.fa")
    write_fasta(p, [("chr1 extra comment", "ACGT" * 50), ("chr2", "TTTTGGGG")])
    recs = list(read_fastx(p))
    assert [r.name for r in recs] == ["chr1", "chr2"]
    assert recs[0].seq == "ACGT" * 50
    assert recs[1].seq == "TTTTGGGG"
    assert recs[0].qual is None


def test_fastx_fastq_and_gzip(tmp_path):
    p = str(tmp_path / "r.fq")
    rng = np.random.default_rng(0)
    reads = sample_reads(rng, make_genome(rng, 500), 5, 50)
    write_fastq(p, reads)
    recs = list(read_fastx(p))
    assert len(recs) == 5
    assert recs[0].name == "read0"
    assert recs[0].qual == "I" * 50
    # gzip path
    pz = str(tmp_path / "r.fq.gz")
    with open(p, "rb") as f, gzip.open(pz, "wb") as z:
        z.write(f.read())
    recs2 = list(read_fastx(pz))
    assert [(r.name, r.seq, r.qual) for r in recs] == [
        (r.name, r.seq, r.qual) for r in recs2]


def test_create_meta_cat_layout(tmp_path):
    # .cat = seq + revcomp per sequence + final '$' (asindex.c:96-110)
    p = str(tmp_path / "g.fa")
    write_fasta(p, [("c1", "ACGTT"), ("c2", "GGGCA")])
    entries = create_meta(p, n_seed=7)
    cat = load_cat(p + ".cat").tobytes().decode()
    assert cat == "ACGTT" + "AACGT" + "GGGCA" + "TGCCC" + "$"
    assert [(e.seq_name, e.offset, e.seq_len) for e in entries] == [
        ("c1", 0, 5), ("c2", 10, 5)]
    back = load_mta(p + ".mta")
    assert [(e.seq_name, e.offset, e.seq_len) for e in back] == [
        ("c1", 0, 5), ("c2", 10, 5)]


def test_create_meta_n_replacement_deterministic(tmp_path):
    p1 = str(tmp_path / "a.fa")
    p2 = str(tmp_path / "b.fa")
    rng = np.random.default_rng(3)
    g = make_genome(rng, 300, n_frac=0.1)
    write_fasta(p1, [("c", g)])
    write_fasta(p2, [("c", g)])
    create_meta(p1, n_seed=42)
    create_meta(p2, n_seed=42)
    c1, c2 = load_cat(p1 + ".cat"), load_cat(p2 + ".cat")
    assert np.array_equal(c1, c2)
    assert not np.any((c1 == ord("N")) | (c1 == ord("n")))
    # lowercase input uppercased
    p3 = str(tmp_path / "c.fa")
    write_fasta(p3, [("c", g.lower())])
    create_meta(p3, n_seed=42)
    assert np.array_equal(load_cat(p3 + ".cat"), c1)


def test_lcg48_matches_c_lrand48():
    # srand48(42); lrand48() x3 — ground truth captured from glibc on this host
    r = Lcg48(42)
    vals = [r.lrand48() for _ in range(3)]
    assert vals == [1598855263, 735945821, 238553827]


def test_truncated_artifacts_raise(tmp_path):
    """Truncated .mfi/.lch artifacts must fail loudly on read, and writes
    must be atomic (tmp+rename) so an interrupted build never leaves a
    partial file at the final path for a resume to trust (ADVICE r4)."""
    from longreadmapper_tpu.formats.lch import read_lch, write_lch
    from longreadmapper_tpu.formats.mfi import MfiData, read_mfi, write_mfi

    hlen = 3
    kl = np.arange(2 * 4 ** hlen, dtype=np.uint64).reshape(-1, 2)
    lch = str(tmp_path / "x.lch")
    write_lch(lch, hlen, kl)
    assert not os.path.exists(lch + ".tmp")
    got_hlen, got = read_lch(lch)
    assert got_hlen == hlen and np.array_equal(got, kl)
    # truncate mid-table
    with open(lch, "r+b") as f:
        f.truncate(os.path.getsize(lch) - 16)
    with pytest.raises(ValueError, match="truncated"):
        read_lch(lch)

    prefix = str(tmp_path / "y")
    bwt = np.frombuffer(b"ard$rcaaaabb", dtype=np.uint8).copy()
    d = MfiData(c=np.arange(256, dtype=np.uint64), o_ratio=4,
                o=np.arange(16, dtype=np.uint64), bwt=bwt,
                csa_ratio=4, csa=np.arange(4, dtype=np.uint64))
    write_mfi(d, prefix)
    assert not os.path.exists(prefix + ".mfi.tmp")
    r = read_mfi(prefix)
    assert np.array_equal(r.bwt, bwt) and np.array_equal(r.csa, d.csa)
    with open(prefix + ".mfi", "r+b") as f:
        f.truncate(os.path.getsize(prefix + ".mfi") - 8)
    with pytest.raises(ValueError, match="truncated"):
        read_mfi(prefix)

    # .sa5 writes are atomic too (resume trusts a size-checked final path)
    sa = np.arange(100, dtype=np.int64)
    write_sa5(sa, str(tmp_path / "z.sa5"))
    assert not os.path.exists(str(tmp_path / "z.sa5.tmp"))
    assert np.array_equal(read_sa5(str(tmp_path / "z.sa5")), sa)
