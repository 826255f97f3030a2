"""Repeat-realistic correctness (VERDICT r2 next #8): a genome with hg-like
repeat structure (SINE/LINE/satellite, ~45% repeat fraction) must map with
exact device-vs-oracle parity — repeats are what stress the informative-seed
threshold (thres), the vote budgets, and the two-tier overflow retry.

The quick test (always on) runs a 400 kb genome / 60 reads.  The full sweep
(LRM_REPEAT=1: 4 Mb / 10k reads, sensitivity recorded) backs the BASELINE.md
repeat-config row; CPU-backend runtime is ~10 min.
"""

import os
import sys

import numpy as np
import pytest

from conftest import sample_reads, write_fasta

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _build(tmp_path, genome, hlen):
    from longreadmapper_tpu.formats.catmeta import (create_meta, load_cat,
                                                    load_mta)
    from longreadmapper_tpu.index.device import build_device_index
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build

    fa = str(tmp_path / "rep.fa")
    write_fasta(fa, [("chrR", genome)])
    create_meta(fa, n_seed=0)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, sa=sa)
    cat = load_cat(prefix)
    kl = lc_build_from_sa(sa, encode_bytes(cat), hlen)
    idx, meta = build_device_index(fmi, kl, hlen, cat, load_mta(fa + ".mta"))
    return fmi, kl, cat, idx, meta, load_mta(fa + ".mta")


def test_repeat_genome_parity(tmp_path):
    from gen_repeat_genome import build_repeat_genome
    from longreadmapper_tpu.formats.sam import cigar_string
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.oracle.refpipe import OracleMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(11)
    genome = build_repeat_genome(rng, 400_000)
    hlen = 10
    params = Params(hlen=hlen)
    fmi, kl, cat, idx, meta, mta = _build(tmp_path, genome, hlen)

    reads = [(f"r{i}", s, None) for i, (_, s, *_ ) in enumerate(
        sample_reads(rng, genome, 60, 500, error_rate=0.03))]
    mapper = TPUMapper(idx, meta, mta, params, chunk_b=64)
    recs = mapper.map_chunk(reads)

    oracle = OracleMapper(fmi, kl, hlen, cat, mta, params)
    n_valid = 0
    for (name, seq, _), rec in zip(reads, recs):
        o = oracle.map_read(seq)
        assert rec.valid == o.valid, name
        assert rec.ed == o.ed, name
        if o.found:
            assert rec.off == o.off, name
        if o.valid:
            assert rec.cigar == cigar_string(o.cigar), name
            n_valid += 1
    # repeats legitimately cost sensitivity (uninformative seeds are
    # dropped at thres, exactly like the reference) — but a repeat-rich
    # genome must still map the majority of 500 bp reads
    assert n_valid >= 40, n_valid
    # the repeat structure must actually exercise the overflow/retry tier
    assert mapper.retried_reads > 0


@pytest.mark.skipif(os.environ.get("LRM_REPEAT") != "1",
                    reason="full repeat sweep is opt-in (LRM_REPEAT=1)")
def test_repeat_genome_sweep(tmp_path):
    """4 Mb repeat-rich genome, 10k 1 kb reads @3%: record sensitivity +
    retry/overflow counts (the BASELINE.md repeat-config row)."""
    from gen_repeat_genome import build_repeat_genome
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(2026)
    genome = build_repeat_genome(rng, 4_000_000)
    # LRM_REPEAT_HLEN=14 validates the deep-table bench default (80-slot
    # compact budget + retry tier) against the repeat-rich config too
    hlen = int(os.environ.get("LRM_REPEAT_HLEN", "12"))
    params = Params(hlen=hlen)
    _, _, _, idx, meta, mta = _build(tmp_path, genome, hlen)

    reads = [(f"r{i}", s, None) for i, (_, s, *_ ) in enumerate(
        sample_reads(rng, genome, 10_000, 1000, error_rate=0.03))]
    mapper = TPUMapper(idx, meta, mta, params, chunk_b=512)
    valid = total = 0
    chunks = (reads[s:s + 512] for s in range(0, len(reads), 512))
    for recs in mapper.map_stream(chunks):
        valid += sum(r.valid for r in recs)
        total += len(recs)
    sens = valid / total
    print(f"\nrepeat sweep: sensitivity {valid}/{total} = {sens:.4f}, "
          f"retried {mapper.retried_reads}, overflow {mapper.overflow_reads}")
    assert total == 10_000
    assert sens >= 0.75, sens


def test_gc_skew_genome_sensitivity(tmp_path):
    """GC-skewed isochore background + repeats (VERDICT r4 missing #6:
    uniform-composition fixtures never stress the lchash row balance —
    AT-rich k-mers crowd their table rows on real-composition genomes).
    1 Mb genome, 600 reads @3%: every read must map exactly (the retry
    tier absorbs the skew-crowded vote slots)."""
    from gen_repeat_genome import build_repeat_genome
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(41)
    genome = build_repeat_genome(rng, 1_000_000, gc_skew=True)
    # composition sanity: a uniform genome is 50% GC; the isochore
    # background centers ~41% (gen_repeat_genome._gc_background)
    gc = sum(genome.count(c) for c in "GC") / len(genome)
    assert gc < 0.47, gc

    hlen = 10
    params = Params(hlen=hlen)
    _, _, _, idx, meta, mta = _build(tmp_path, genome, hlen)
    reads = [(f"g{i}", s, None) for i, (_, s, *_) in enumerate(
        sample_reads(rng, genome, 600, 1000, error_rate=0.03))]
    mapper = TPUMapper(idx, meta, mta, params, chunk_b=256)
    valid = total = 0
    for recs in mapper.map_stream(reads[s:s + 256]
                                  for s in range(0, len(reads), 256)):
        valid += sum(r.valid for r in recs)
        total += len(recs)
    assert total == 600
    assert valid / total >= 0.995, (valid, total)
