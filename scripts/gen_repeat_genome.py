#!/usr/bin/env python
"""Repeat-rich synthetic genome generator (hg-like repeat structure).

Uniform-random test genomes never stress the informative-seed threshold
(`thres`, reference alnmain.c:360), the wide-seed fallback, or the vote
budgets — real genomes are ~45% repeats.  This builds a deterministic
genome with the three repeat classes that matter for seeding:

  * SINE-like: a ~300 bp consensus inserted at high copy number, each copy
    independently diverged ~10% (substitutions + rare indels) — the
    "many-interval" seeds that overflow vote slots.
  * LINE-like: a ~6 kb consensus at lower copy number, ~15% diverged, often
    5'-truncated like real L1s — long homologous stretches.
  * Satellite: tandem arrays of a ~171 bp monomer (~5% diverged per copy),
    arrays of tens of copies — the worst case for per-phase vote
    compaction (every phase of a read lands in one array).

Fractions default to ~30% SINE + ~10% LINE + ~5% satellite ≈ 45% repeat.

Usage:
  gen_repeat_genome.py --out ref.fa --mb 4 [--seed 7] [--repeat-frac 0.45]
As a library: `build_repeat_genome(rng, n) -> str`.
"""

import argparse
import sys

import numpy as np

_B = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n) -> np.ndarray:
    return _B[rng.integers(0, 4, n)]


def _gc_background(rng, n: int, gc_mean: float = 0.41,
                   block: int = 100_000) -> np.ndarray:
    """Isochore-like background: GC content varies per ~100 kb block
    around the human-like mean (real genomes are NOT 25/25/25/25 —
    hg38 is ~41% GC with 30-60% isochore blocks).  Skewed composition
    stresses the lchash load balance (AT-rich k-mers crowd their table
    rows) and the C-table/backward-search paths in a way uniform
    fixtures never do (VERDICT r4 missing #6)."""
    out = np.empty(n, np.uint8)
    for s0 in range(0, n, block):
        m = min(block, n - s0)
        gc = float(np.clip(rng.normal(gc_mean, 0.08), 0.25, 0.62))
        pr = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
        out[s0:s0 + m] = _B[rng.choice(4, size=m, p=pr)]
    return out


def _diverge(rng, seq: np.ndarray, sub: float, indel: float) -> np.ndarray:
    """Substitute/insert/delete per-base — one diverged repeat copy."""
    s = seq.copy()
    m = rng.random(len(s)) < sub
    s[m] = _B[rng.integers(0, 4, int(m.sum()))]
    if indel > 0:
        keep = rng.random(len(s)) >= indel / 2
        s = s[keep]
        ins = np.flatnonzero(rng.random(len(s)) < indel / 2)
        if ins.size:
            s = np.insert(s, ins, _B[rng.integers(0, 4, ins.size)])
    return s


def build_repeat_genome(rng, n: int, repeat_frac: float = 0.45,
                        sine_frac: float = 0.30, line_frac: float = 0.10,
                        gc_skew: bool = False) -> str:
    """n-base genome: random background with repeat copies written over it
    at random positions (overlaps allowed, like real nested repeats).
    gc_skew draws the background from isochore-like GC blocks instead of
    uniform 25/25/25/25 (_gc_background)."""
    g = _gc_background(rng, n) if gc_skew else _rand_seq(rng, n)
    sine = _rand_seq(rng, 300)
    line = _rand_seq(rng, 6000)
    sat = _rand_seq(rng, 171)

    def paste(copy: np.ndarray):
        p = int(rng.integers(0, max(1, n - len(copy))))
        g[p:p + len(copy)] = copy[: n - p]

    budget = int(n * repeat_frac)
    sine_budget = int(n * sine_frac)
    line_budget = int(n * line_frac)
    placed = 0
    while placed < sine_budget:
        c = _diverge(rng, sine, 0.10, 0.02)
        paste(c)
        placed += len(c)
    while placed < sine_budget + line_budget:
        c = _diverge(rng, line, 0.15, 0.03)
        if rng.random() < 0.5:          # 5'-truncation like real L1 copies
            c = c[int(rng.integers(0, len(c) // 2)):]
        paste(c)
        placed += len(c)
    while placed < budget:              # satellite arrays fill the rest
        reps = int(rng.integers(10, 60))
        arr = np.concatenate(
            [_diverge(rng, sat, 0.05, 0.0) for _ in range(reps)])
        paste(arr)
        placed += len(arr)
    return g.tobytes().decode("ascii")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--repeat-frac", type=float, default=0.45)
    ap.add_argument("--gc-skew", action="store_true")
    ap.add_argument("--name", default="chrR")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    n = int(args.mb * 1_000_000)
    g = build_repeat_genome(rng, n, repeat_frac=args.repeat_frac,
                            gc_skew=args.gc_skew)
    with open(args.out, "w") as f:
        f.write(f">{args.name}\n")
        for i in range(0, n, 80):
            f.write(g[i:i + 80] + "\n")
    print(f"{args.out}: {n} bases, ~{args.repeat_frac:.0%} repeat",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
