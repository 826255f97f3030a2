"""Two-tier vote budget: the compact step must flag reads whose executed
phases exceed its slots, and the mapper must re-run exactly those reads
through the exact-slots tier so final results match the unbudgeted oracle
(VERDICT r2 next #2: cut seed_vote's ~80%-padding gathers)."""

import numpy as np

from conftest import make_genome, write_fasta


def _build(tmp_path, genome, hlen):
    from longreadmapper_tpu.formats.catmeta import (create_meta, load_cat,
                                                    load_mta)
    from longreadmapper_tpu.index.device import build_device_index
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build

    fa = str(tmp_path / "g.fa")
    write_fasta(fa, [("c1", genome)])
    mta = create_meta(fa, n_seed=0)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, sa=sa)
    cat = load_cat(prefix)
    kl = lc_build_from_sa(sa, encode_bytes(cat), hlen)
    idx, meta = build_device_index(fmi, kl, hlen, cat, mta)
    return fa, fmi, kl, cat, idx, meta, load_mta(fa + ".mta")


def test_compact_tier_sizes():
    from longreadmapper_tpu.mapping.pipeline import MapperConfig

    cfg = MapperConfig(B=2048, L=1024, seed_len=20, gap_len=1, thres=300,
                       hlen=12, n=8_000_000, dollar_pos=0, accept_score=0.6,
                       error_rate=0.05)
    from dataclasses import replace
    exact = replace(cfg, exact_slots=True)
    assert cfg.vote_slots < exact.vote_slots
    assert exact.vote_slots == exact.vote_slots_exact
    # the compact tier still covers the statistical mean with 5-sigma slack
    lam = cfg.n / 4 ** cfg.hlen
    assert cfg.vote_slots >= cfg.max_seeds * lam


def test_overflow_retry_matches_oracle(tmp_path):
    """Reads from a 5-copy tandem array overflow the compact tier (~100
    votes/phase vs 64 slots) but fit the exact tier (128): the retry must
    fire and the final records must equal the unbudgeted oracle's."""
    from longreadmapper_tpu.formats.sam import cigar_string
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.oracle.refpipe import OracleMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(42)
    motif = make_genome(rng, 420)
    genome = (make_genome(rng, 3000) + motif * 5 + make_genome(rng, 3000))
    hlen = 8
    params = Params(hlen=hlen, seed_len=20, thres=300)
    fa, fmi, kl, cat, idx, meta, mta = _build(tmp_path, genome, hlen)

    mapper = TPUMapper(idx, meta, mta, params, chunk_b=8)
    cfg, _ = mapper._step_for(512)
    assert not cfg.exact_slots and cfg.vote_slots == 64, cfg.vote_slots
    cfg_r, _ = mapper._retry_step_for(512)
    assert cfg_r.exact_slots and cfg_r.vote_slots == 128, cfg_r.vote_slots

    # reads: 4 from the tandem region (overflow the compact tier), 4 from
    # unique sequence (must not retry)
    reads = []
    for i in range(4):
        p = 3000 + 420 + i * 10
        reads.append((f"rep{i}", genome[p:p + 420], None))
    for i in range(4):
        p = 100 + i * 500
        reads.append((f"uni{i}", genome[p:p + 420], None))

    recs = mapper.map_chunk(reads)
    assert mapper.retried_reads >= 4
    assert mapper.overflow_reads == 0   # the exact tier absorbed them

    oracle = OracleMapper(fmi, kl, hlen, cat, mta, params)
    for (name, seq, _), rec in zip(reads, recs):
        o = oracle.map_read(seq)
        assert rec.valid == o.valid, name
        assert rec.ed == o.ed, name
        if o.found:
            assert rec.off == o.off, name
        if o.valid:
            assert rec.cigar == cigar_string(o.cigar), name
