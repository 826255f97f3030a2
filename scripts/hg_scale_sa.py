#!/usr/bin/env python
"""hg19-scale suffix-array build proof (VERDICT r2 #5 / SURVEY L0).

The reference's own scale experiment indexes hg19 — a ~3.1e9-base genome
whose .cat (forward + reverse-complement) is ~6.2e9 bytes
(/root/reference/scripts/gen-sbatch-scripts.py:74-111, 40-bit codec
psascan/sa_use.h:17-28).  This script builds exactly that size in RAM with
the native SA-IS (single g++ translation unit, no pSAscan), then proves the
result:

  * order spot-parity: for K sampled adjacent SA pairs, the suffixes are
    verified lexicographically ordered by direct chunked text comparison;
  * permutation check: a bitmap over all n positions confirms every
    position appears exactly once;
  * .sa5 codec round-trip on sampled offsets (the 40-bit on-disk words).

Logs phase wall times, peak RSS, and disk use.  The in-RAM build is
possible because sais.cpp runs genome-scale builds INSIDE the caller's
(n+1)-slot int64 buffer with a uint8 rank-remapped text copy — peak
~11.5 bytes/char, ~72 GB at 6.2e9 (vs ~19 B/char before round 3; this
host: 125 GB, 1 core).

Usage: hg_scale_sa.py --dir /tmp/lrm_hg --bases 3100000000 [--keep]
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[{time.strftime('%H:%M:%S')}] (peak {rss:.1f} GB)", *a,
          file=sys.stderr, flush=True)


def suffix_less(text: np.ndarray, a: int, b: int, chunk: int = 1 << 16
                ) -> bool:
    """text[a:] < text[b:] lexicographically (implicit smallest sentinel)."""
    n = text.shape[0]
    if a == b:
        return False
    while a < n and b < n:
        m = min(chunk, n - a, n - b)
        xa, xb = text[a:a + m], text[b:b + m]
        neq = np.nonzero(xa != xb)[0]
        if neq.size:
            i = int(neq[0])
            return bool(xa[i] < xb[i])
        a += m
        b += m
    return a > b  # shorter suffix (earlier sentinel) sorts first


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--bases", type=int, default=3_100_000_000)
    ap.add_argument("--contigs", type=int, default=24)
    ap.add_argument("--seed", type=int, default=19)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--keep", action="store_true",
                    help="keep ref.fa/.cat/.sa5 (default: delete on success)")
    ap.add_argument("--external-gb", type=float, default=0,
                    help="build via the blocked external-memory path with "
                         "this RAM budget (GB) instead of in-RAM SA-IS; "
                         "validation then runs off the .sa5 on disk")
    args = ap.parse_args(argv)

    from gen_big_genome import write_contig
    from longreadmapper_tpu.formats.catmeta import create_meta
    from longreadmapper_tpu.formats.ui40 import write_sa5
    from longreadmapper_tpu import native

    os.makedirs(args.dir, exist_ok=True)
    fa = os.path.join(args.dir, "ref.fa")

    t0 = time.time()
    if not (os.path.exists(fa) and os.path.getsize(fa) > args.bases):
        rng = np.random.default_rng(args.seed)
        per = args.bases // args.contigs
        with open(fa, "wb") as fp:
            for i in range(args.contigs):
                m = (per if i < args.contigs - 1
                     else args.bases - per * (args.contigs - 1))
                write_contig(fp, f"chr{i + 1}", m, rng, 80)
        log(f"genome: {args.bases} bases in {time.time() - t0:.0f}s")

    t0 = time.time()
    create_meta(fa, n_seed=0)
    prefix = fa + ".cat"
    n = os.path.getsize(prefix)
    log(f"create_meta: {time.time() - t0:.0f}s (.cat = {n} bytes)")

    if args.external_gb:
        return _external(args, prefix, n)

    t0 = time.time()
    text = np.fromfile(prefix, dtype=np.uint8)
    log(f"text read: {time.time() - t0:.0f}s")
    t0 = time.time()
    sa = native.suffix_array(text)
    dt = time.time() - t0
    assert native.HAVE_NATIVE, "native sais required at this scale"
    log(f"sais: {dt:.0f}s for n={n} ({n / dt / 1e6:.1f} MB/s, 1 core)")

    t0 = time.time()
    rng = np.random.default_rng(7)
    idx = np.sort(rng.integers(0, n - 1, args.samples))
    bad = 0
    for i in idx:
        if not suffix_less(text, int(sa[i]), int(sa[i + 1])):
            bad += 1
            log(f"ORDER VIOLATION at rank {i}: sa={sa[i]},{sa[i + 1]}")
    assert bad == 0, f"{bad} order violations"
    log(f"order spot-parity: {args.samples} adjacent pairs OK "
        f"({time.time() - t0:.0f}s)")

    t0 = time.time()
    seen = np.zeros(n, dtype=bool)
    seen[sa] = True
    assert bool(seen.all()), "SA is not a permutation"
    del seen
    log(f"permutation check: OK ({time.time() - t0:.0f}s)")

    t0 = time.time()
    del text
    write_sa5(sa, prefix + ".sa5")
    log(f"write_sa5: {time.time() - t0:.0f}s "
        f"({os.path.getsize(prefix + '.sa5')} bytes)")

    # 40-bit codec round-trip on sampled offsets (read the 5-byte words
    # directly rather than materializing the full 49.6 GB int64 array;
    # .sa5 is headerless — 5n bytes, entry i at offset 5i, sa_use.h:17-47)
    t0 = time.time()
    assert os.path.getsize(prefix + ".sa5") == 5 * n
    with open(prefix + ".sa5", "rb") as f:
        for i in rng.integers(0, n, 64):
            f.seek(5 * int(i))
            v = int.from_bytes(f.read(5), "little")
            assert v == int(sa[i]), (i, v, int(sa[i]))
    log(f"sa5 codec spot round-trip: 64 offsets OK ({time.time() - t0:.0f}s)")

    if not args.keep:
        for p in (fa, prefix, prefix + ".sa5", fa + ".mta"):
            if os.path.exists(p):
                os.remove(p)
        log("artifacts deleted (pass --keep to retain)")
    log("hg-scale SA build: PASS")
    return 0


def _external(args, prefix: str, n: int) -> int:
    """Bounded-RAM build + disk-resident validation (the pSAscan-shaped
    run: psascan.h:52-57 computes with a RAM budget far below 11.5 B/char).
    RSS stays ~the block working set; validation reads the .sa5 from disk
    (spot pairs by offset, permutation bitmap by streamed chunks)."""
    from longreadmapper_tpu.index.sa_external import sa_build_external

    ram = int(args.external_gb * (1 << 30))
    sa5 = prefix + ".sa5"
    t0 = time.time()
    sa_build_external(prefix, ram, tmpdir=args.dir)
    dt = time.time() - t0
    log(f"external build: {dt:.0f}s for n={n} ({n / dt / 1e6:.2f} MB/s, "
        f"budget {args.external_gb:.1f} GB, 1 core)")

    assert os.path.getsize(sa5) == 5 * n
    text = np.memmap(prefix, dtype=np.uint8, mode="r")

    def entry(f, i: int) -> int:
        f.seek(5 * i)
        return int.from_bytes(f.read(5), "little")

    t0 = time.time()
    rng = np.random.default_rng(7)
    bad = 0
    with open(sa5, "rb") as f:
        for i in np.sort(rng.integers(0, n - 1, args.samples)):
            a, b = entry(f, int(i)), entry(f, int(i) + 1)
            if not suffix_less(text, a, b):
                bad += 1
                log(f"ORDER VIOLATION at rank {i}: sa={a},{b}")
    assert bad == 0, f"{bad} order violations"
    log(f"order spot-parity: {args.samples} adjacent pairs OK "
        f"({time.time() - t0:.0f}s)")

    t0 = time.time()
    seen = np.zeros(n, dtype=bool)
    chunk = 1 << 27
    with open(sa5, "rb") as f:
        for s in range(0, n, chunk):
            m = min(chunk, n - s)
            raw = np.fromfile(f, dtype=np.uint8, count=5 * m).reshape(m, 5)
            low = raw[:, 0:4].copy().view(np.uint32).reshape(m)
            seen[(raw[:, 4].astype(np.int64) << 32)
                 | low.astype(np.int64)] = True
    assert bool(seen.all()), "SA is not a permutation"
    del seen
    log(f"permutation check: OK ({time.time() - t0:.0f}s)")

    if not args.keep:
        fa = os.path.join(args.dir, "ref.fa")
        for p in (fa, prefix, sa5, fa + ".mta"):
            if os.path.exists(p):
                os.remove(p)
        log("artifacts deleted (pass --keep to retain)")
    log("hg-scale EXTERNAL SA build: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
