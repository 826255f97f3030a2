"""Index-layer tests, re-creating the reference's test strategy (SURVEY.md §4):
  - fmi build + .mfi round-trip + exact-match query (test/test-fmidx.cc:13-44)
  - CSA correctness (test/test-fmidx.cc:73-108)
  - lc_aln == fmi_aln invariant (test/test-lchash.cc:30-48)
plus property tests the reference lacked: fmi_aln == naive scan, device rank
== host rank, device lchash == host lchash.
"""

import os

import numpy as np
import pytest

from longreadmapper_tpu.formats.catmeta import load_cat
from longreadmapper_tpu.formats.lch import read_lch, write_lch
from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
from longreadmapper_tpu.index.lchash import lc_build_device, lc_build_host
from longreadmapper_tpu.index.device import build_device_index
from longreadmapper_tpu.formats.catmeta import create_meta
from longreadmapper_tpu.index.sa import sa_build

from conftest import make_genome, write_fasta


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idx")
    rng = np.random.default_rng(7)
    genome = make_genome(rng, 6000)
    fa = str(tmp / "g.fa")
    write_fasta(fa, [("chr1", genome)])
    mta = create_meta(fa, n_seed=1)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, o_ratio=32, csa_ratio=4, sa=sa)
    cat = load_cat(prefix)
    return dict(genome=genome, fa=fa, prefix=prefix, fmi=fmi, cat=cat, mta=mta)


def naive_count(cat: np.ndarray, pattern: bytes):
    """All occurrence positions of `pattern` in the cat text."""
    s = cat.tobytes()
    out, i = [], s.find(pattern)
    while i >= 0:
        out.append(i)
        i = s.find(pattern, i + 1)
    return out


def test_sa_is_sorted_suffixes(small_index):
    cat, fmi = small_index["cat"], small_index["fmi"]
    sa = fmi.sa
    n = len(cat)
    # spot-check lexicographic order on 200 adjacent pairs
    rng = np.random.default_rng(0)
    for i in rng.integers(0, n - 1, 200):
        a = cat[sa[i]:sa[i] + 64].tobytes()
        b = cat[sa[i + 1]:sa[i + 1] + 64].tobytes()
        assert a <= b


def test_fmi_aln_matches_naive(small_index):
    cat, fmi = small_index["cat"], small_index["fmi"]
    rng = np.random.default_rng(1)
    n = len(cat)
    for _ in range(40):
        qlen = int(rng.integers(3, 30))
        start = int(rng.integers(0, n - 1 - qlen))
        pattern = cat[start:start + qlen].tobytes()
        if b"$" in pattern:
            continue
        hits, k, l = fmi.fmi_aln(encode_bytes(np.frombuffer(pattern, np.uint8)))
        expect = sorted(naive_count(cat, pattern))
        assert hits == len(expect)
        got = sorted(int(fmi.sa_access(i)) for i in range(k, l + 1))
        assert got == expect


def test_fmi_aln_absent_pattern(small_index):
    fmi = small_index["fmi"]
    # a pattern absent with overwhelming probability in 6kb
    q = encode_bytes(np.frombuffer(b"ACGT" * 10, np.uint8))
    hits, k, l = fmi.fmi_aln(q)
    occs = naive_count(small_index["cat"], b"ACGT" * 10)
    assert hits == len(occs)


def test_mfi_roundtrip(small_index, tmp_path):
    fmi = small_index["fmi"]
    prefix = str(tmp_path / "rt")
    fmi.write(prefix)
    back = FMIndex.read(prefix, with_sa=False)
    assert np.array_equal(back.c, fmi.c)
    assert back.o_ratio == fmi.o_ratio
    assert np.array_equal(back.o, fmi.o)
    assert np.array_equal(back.bwt, fmi.bwt)
    assert back.csa_ratio == fmi.csa_ratio
    assert np.array_equal(back.csa, fmi.csa)


def test_csa_access_matches_sa(small_index):
    fmi = small_index["fmi"]
    # csa_access walks LF to a sampled row (fmidx.c:315-331); it can bail to 0
    # after 5*ratio steps, and '$' returns the counter — both are reference
    # behavior; valid (non-bailed) results must equal SA[i].
    rng = np.random.default_rng(2)
    checked = 0
    for i in rng.integers(0, fmi.length, 300):
        got = fmi.csa_access(int(i))
        if got != 0:
            assert got == int(fmi.sa[i])
            checked += 1
    assert checked > 100


def test_lch_roundtrip_and_lc_aln_equiv(small_index, tmp_path):
    fmi = small_index["fmi"]
    hlen = 5
    kl = lc_build_host(fmi, hlen)
    p = str(tmp_path / "x.lch")
    write_lch(p, hlen, kl)
    h2, kl2 = read_lch(p)
    assert h2 == hlen and np.array_equal(kl2, kl)

    # invariant: lchash-accelerated lookup == plain fmi_aln (test-lchash.cc:30-48)
    cat = small_index["cat"]
    rng = np.random.default_rng(3)
    for _ in range(30):
        qlen = int(rng.integers(hlen, 25))
        start = int(rng.integers(0, len(cat) - 2 - qlen))
        q = encode_bytes(cat[start:start + qlen])
        if (q >= 4).any():
            continue
        # lc_aln: table-lookup the last hlen chars, then backward-search the rest
        num = 0
        for c in q[qlen - hlen:]:
            num = (num << 2) | int(c)
        k, l = int(kl[num, 0]), int(kl[num, 1])
        if (k, l) == (0, 0):
            r1 = 0
            k1, l1 = k, l
        else:
            r1, k1, l1 = fmi.fmi_aln(q[: qlen - hlen], k, l)
        r2, k2, l2 = fmi.fmi_aln(q)
        assert (r1, ) == (r2, )
        if r1 > 0:
            assert (k1, l1) == (k2, l2)


def test_lchash_covers_all_kmers(small_index):
    fmi = small_index["fmi"]
    hlen = 4
    kl = lc_build_host(fmi, hlen)
    # every k-mer either absent (0,0) or a valid interval matching fmi_aln
    for num in range(4 ** hlen):
        codes = [(num >> (2 * (hlen - 1 - i))) & 3 for i in range(hlen)]
        r, k, l = fmi.fmi_aln(np.array(codes, np.uint8))
        if r == 0:
            assert tuple(kl[num]) == (0, 0)
        else:
            assert tuple(kl[num]) == (k, l)


def test_device_index_rank_matches_host(small_index):
    import jax.numpy as jnp
    from longreadmapper_tpu.ops.rank import occ

    fmi, cat, mta = small_index["fmi"], small_index["cat"], small_index["mta"]
    hlen = 5
    kl = lc_build_host(fmi, hlen)
    idx, meta = build_device_index(fmi, kl, hlen, cat, mta)

    rng = np.random.default_rng(5)
    locs = rng.integers(0, fmi.length, 500)
    cs = rng.integers(0, 4, 500)
    got = np.asarray(occ(idx.packed, idx.occ_samp, meta.dollar_pos,
                         jnp.asarray(cs, jnp.int32), jnp.asarray(locs)))
    want = fmi.occ_access(cs, locs)
    assert np.array_equal(got, want)


def test_device_lchash_matches_host(small_index):
    fmi, cat, mta = small_index["fmi"], small_index["cat"], small_index["mta"]
    hlen = 5
    kl_host = lc_build_host(fmi, hlen)
    idx, meta = build_device_index(fmi, kl_host, hlen, cat, mta)
    kl_dev = lc_build_device(idx.packed, idx.occ_samp, idx.c4,
                             meta.dollar_pos, meta.n, hlen, chunk=256)
    assert np.array_equal(kl_dev, kl_host)


def test_sa_derived_lchash_matches_host(small_index):
    """lc_build_from_sa (searchsorted over base-5 suffix keys) must be
    bit-identical to the FM-backward-search build for every k-mer."""
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    fmi, cat = small_index["fmi"], small_index["cat"]
    for hlen in (3, 5):
        kl_fm = lc_build_host(fmi, hlen)
        kl_sa = lc_build_from_sa(fmi.sa, encode_bytes(cat), hlen)
        np.testing.assert_array_equal(kl_fm, kl_sa)


def test_sa_ctx_table_contents(small_index):
    """Fused ctx words: 2-bit pack of text[SA[p]-16..SA[p])."""
    from longreadmapper_tpu.index.device import _pack_ctx_words
    fmi, cat = small_index["fmi"], small_index["cat"]
    codes = encode_bytes(cat)
    ctx = _pack_ctx_words(fmi.sa, codes)
    rng = np.random.default_rng(3)
    for p in rng.integers(0, len(cat), 100):
        sa_v = int(fmi.sa[p])
        want = 0
        for u in range(16):
            pos = sa_v - 16 + u
            c = int(codes[pos]) if 0 <= pos and codes[pos] < 4 else 0
            want |= c << (2 * u)
        got = int(np.array(ctx[p], np.int32).view(np.uint32))
        assert got == want


def test_sa_build_xla_matches_native(small_index):
    """Device prefix-doubling SA == native SA-IS (position-exact)."""
    from longreadmapper_tpu.index.sa import sa_build_xla
    from longreadmapper_tpu.index.fmi import encode_bytes
    cat, fmi = small_index["cat"], small_index["fmi"]
    sa_dev = sa_build_xla(encode_bytes(cat))
    np.testing.assert_array_equal(sa_dev, fmi.sa)


def test_device_index_cache_roundtrip(tmp_path):
    """load_device_index writes a .devidx cache on first load, hits it on
    the second (byte-equal arrays), and rebuilds when an artifact changes
    (VERDICT r2 missing #4: genome-scale load was 64 min of recompute)."""
    import jax.numpy as jnp
    from longreadmapper_tpu.index.device import (_cache_dir,
                                                 load_device_index)
    from longreadmapper_tpu.runtime.accidx import build_index
    from longreadmapper_tpu.utils.config import Params

    rng = np.random.default_rng(23)
    genome = make_genome(rng, 5000)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, [("c1", genome)])
    # devidx=False: keep the load-side derive+save path under test (the
    # default build now persists the cache at index time, cli --no-devidx)
    build_index(fa, Params(hlen=5), use_device=False, verbose=False,
                devidx=False)
    assert not os.path.isdir(_cache_dir(fa))

    idx1, meta1, mta1 = load_device_index(fa)
    assert os.path.isdir(_cache_dir(fa))
    idx2, meta2, mta2 = load_device_index(fa)
    assert meta1 == meta2
    for a, b in zip(idx1, idx2):
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cache must not serve a stale layout after an artifact changes:
    # rebuild the index from a different genome (same file names)
    genome2 = make_genome(np.random.default_rng(24), 5000)
    write_fasta(fa, [("c1", genome2)])
    # devidx=False leaves the now-STALE phase-1 cache in place: the load
    # must reject it by artifact fingerprint and rebuild
    build_index(fa, Params(hlen=5), use_device=False, verbose=False,
                devidx=False)
    idx3, meta3, _ = load_device_index(fa)
    assert not np.array_equal(np.asarray(idx3.sa_ctx),
                              np.asarray(idx1.sa_ctx))
    # and the refreshed cache now matches the new artifacts
    idx4, meta4, _ = load_device_index(fa)
    np.testing.assert_array_equal(np.asarray(idx3.sa_ctx),
                                  np.asarray(idx4.sa_ctx))
    # (force_pos_dtype cache bypass is exercised by tests/_pos64_worker.py,
    # which runs in its own process because it flips jax x64 mode)
