"""Device-side read encode (cfg.raw_input): uniform chunks ship raw ASCII
and the step decodes + reverse-complements on device.  Must be
record-identical to the host-encode path for every base class (upper,
lower, N, other junk bytes) and fall back to host packing for ragged
chunks."""

import os

import numpy as np

from conftest import sample_reads, write_fasta


def _mapper(tmp_path, genome, hlen, chunk_b):
    from longreadmapper_tpu.formats.catmeta import (create_meta, load_cat,
                                                    load_mta)
    from longreadmapper_tpu.index.device import build_device_index
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    fa = str(tmp_path / "raw.fa")
    write_fasta(fa, [("chr1", genome)])
    create_meta(fa, n_seed=0)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, sa=sa)
    cat = load_cat(prefix)
    kl = lc_build_from_sa(sa, encode_bytes(cat), hlen)
    idx, meta = build_device_index(fmi, kl, hlen, cat, load_mta(fa + ".mta"))
    return TPUMapper(idx, meta, load_mta(fa + ".mta"), Params(hlen=hlen),
                     chunk_b=chunk_b)


def _recs_equal(ra, rb):
    for a, b in zip(ra, rb):
        assert (a.valid, a.ed, a.off, a.cigar, a.flag) == \
               (b.valid, b.ed, b.off, b.cigar, b.flag), a.qname


def test_raw_vs_host_encode(tmp_path, monkeypatch):
    rng = np.random.default_rng(41)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 200_000))
    mapper = _mapper(tmp_path, genome, 10, 32)

    # uniform 500 bp chunk with lowercase, N runs, and junk bytes
    reads = []
    for i, (_, s, *_) in enumerate(sample_reads(rng, genome, 30, 500,
                                                error_rate=0.04)):
        s = list(s)
        if i % 3 == 0:
            s[10:60] = [c.lower() for c in s[10:60]]
        if i % 4 == 0:
            s[100:108] = "N" * 8
        if i % 7 == 0:
            s[200] = "x"
        reads.append((f"r{i}", "".join(s), None))
    # pad rows exist too (30 reads < chunk 32)

    ra = mapper.map_chunk(reads)
    assert len(ra) == len(reads)
    monkeypatch.setenv("LRM_HOST_ENCODE", "1")
    rb = mapper.map_chunk(reads)
    monkeypatch.delenv("LRM_HOST_ENCODE")
    _recs_equal(ra, rb)
    assert sum(r.valid for r in ra) >= 25


def test_ragged_chunk_falls_back(tmp_path):
    """Mixed-length chunks must take the host path (and map correctly)."""
    rng = np.random.default_rng(43)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 120_000))
    mapper = _mapper(tmp_path, genome, 9, 16)
    reads = []
    for i in range(12):
        p = int(rng.integers(0, len(genome) - 700))
        reads.append((f"r{i}", genome[p:p + 300 + 17 * i], None))
    recs = mapper.map_chunk(reads)
    assert sum(r.valid for r in recs) == 12
    assert not mapper._raw_steps  # ragged: the raw variant never compiled
