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


def test_forced_slot_override(monkeypatch):
    """LRM_VOTE_SLOTS forces the compact-tier budget (A/B knob): 16-granular,
    clamped to [64, exact]; exact tier is unaffected."""
    from dataclasses import replace

    from longreadmapper_tpu.mapping.pipeline import MapperConfig

    cfg = MapperConfig(B=2048, L=1024, seed_len=20, gap_len=1, thres=300,
                       hlen=14, n=8_000_000, dollar_pos=0, accept_score=0.6,
                       error_rate=0.05)
    monkeypatch.setenv("LRM_VOTE_SLOTS", "64")
    assert cfg.vote_slots == 64
    monkeypatch.setenv("LRM_VOTE_SLOTS", "70")      # rounds up to 16-gran
    assert cfg.vote_slots == 80
    monkeypatch.setenv("LRM_VOTE_SLOTS", "16")      # clamped up to 64
    assert cfg.vote_slots == 64
    monkeypatch.setenv("LRM_VOTE_SLOTS", "100000")  # clamped to exact
    assert cfg.vote_slots == cfg.vote_slots_exact
    exact = replace(cfg, exact_slots=True)
    monkeypatch.setenv("LRM_VOTE_SLOTS", "64")
    assert exact.vote_slots == exact.vote_slots_exact
    monkeypatch.delenv("LRM_VOTE_SLOTS")
    assert cfg.vote_slots == 80  # hlen-14 computed default


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


def test_no_retry_on_random_genome(tmp_path):
    """Self-hit calibration regression: every sampled seed matches itself,
    so the compact budget must model mean = max_seeds*(1+lam) — the
    lam-only model undershot and silently retried ~23% of reads on the
    RANDOM 4 Mb bench config (round 3).  On a random genome the retry
    tier must essentially never fire."""
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(6)
    genome = make_genome(rng, 400_000)
    hlen = 9   # lam = 800k/4^9 ~ 3 — a background-dominated config
    params = Params(hlen=hlen)
    fa, fmi, kl, cat, idx, meta, mta = _build(tmp_path, genome, hlen)

    reads = []
    comp = str.maketrans("ACGT", "TGCA")
    for i in range(64):
        p = int(rng.integers(0, len(genome) - 700))
        s = genome[p:p + 600]
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        chars = np.frombuffer(s.encode(), np.uint8).copy()
        mask = rng.random(600) < 0.03
        chars[mask] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(mask.sum()))]
        reads.append((f"r{i}", chars.tobytes().decode(), None))

    mapper = TPUMapper(idx, meta, mta, params, chunk_b=64)
    recs = mapper.map_chunk(reads)
    assert sum(r.valid for r in recs) >= 60
    assert mapper.retried_reads == 0, mapper.retried_reads


def test_gact_saturation_retry_tier(tmp_path, monkeypatch):
    """A gact chunk flagged with overflow bit 1 (shared run-buffer
    saturation) must re-run through the 4x-buffer tier and come back with
    correct CIGARs and the flag cleared (VERDICT r4 #7: no undocumented
    corrupt-CIGAR mode).  The saturation itself is exercised at the ops
    level (test_gact.py::test_gact_traceback_c_saturation_flagged); here
    the mapper wiring is driven by forcing the flag on a clean chunk and
    checking the retried output equals the direct mapping."""
    import numpy as np
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(23)
    genome = make_genome(rng, 60000)
    fa, fmi, kl, cat, idx, meta, mta = _build(tmp_path, genome, 6)
    params = Params(hlen=6)
    monkeypatch.setenv("LRM_MID_DIRS_BUDGET", "0")   # force the gact path
    mapper = TPUMapper(idx, meta, mta, params, chunk_b=4)

    reads = []
    for i in range(4):
        p = int(rng.integers(0, len(genome) - 2600))
        ch = np.frombuffer(genome[p:p + 2600].encode(), np.uint8).copy()
        m = rng.random(2600) < 0.02
        ch[m] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(m.sum()))]
        reads.append((f"s{i}", ch.tobytes().decode(), None))

    cfg, _ = mapper._step_for(4096)
    assert cfg.use_gact

    baseline = mapper.map_chunk(reads)
    assert mapper.retried_sat_chunks == 0

    # force the saturation bit on a fresh fetch and let the tier re-walk
    pending = mapper.submit_chunk(reads)
    import jax
    patched = []
    for cfg_p, reads_p, lens_p, out in pending:
        out = dict(out)
        blob = np.asarray(jax.device_get(out["blob"])).copy()
        mw = 4 * cfg_p.meta_words
        meta_v = np.ascontiguousarray(blob[:, :mw]).view(np.int32)
        meta_v[:, cfg_p.meta_words - 1] |= 2
        blob[:, :mw] = meta_v.view(np.int8)
        out["blob"] = jax.numpy.asarray(blob)
        patched.append((cfg_p, reads_p, lens_p, out))
    recs = mapper.collect_chunk(patched)
    assert mapper.retried_sat_chunks == 1
    for r0, r1 in zip(baseline, recs):
        assert r1.valid == r0.valid
        assert r1.ed == r0.ed and r1.off == r0.off
        assert r1.cigar == r0.cigar
    # the re-walk did not saturate -> flag cleared in the final meta
    assert mapper.overflow_reads == 0


def test_auto_hlen_rule():
    """One hlen rule across surfaces (VERDICT r4 weak #2): 14 for real
    genomes, the reference's 12 only for sub-Mb fixtures."""
    from longreadmapper_tpu.utils.config import auto_hlen

    assert auto_hlen(120_001) == 12            # 60 kb test fixture
    assert auto_hlen(8_000_001) == 14          # the 4 Mb bench genome
    assert auto_hlen(1_000_000_001) == 14      # the 500 Mb bench genome
    assert auto_hlen(6_200_000_000) == 14      # hg19 scale
