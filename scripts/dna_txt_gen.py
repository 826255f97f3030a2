#!/usr/bin/env python
"""Random DNA text/FASTA generator — the reference's test-fixture tool
(/root/reference/scripts/dna_txt_gen.py) with a seed flag and FASTA output.

Usage:
  dna_txt_gen.py LENGTH [--seed N] [--fasta NAME] [--n-frac F] [--line W]

Plain mode writes one line of ACGT to stdout (the reference behavior);
--fasta wraps it in a single-record FASTA; --n-frac injects ambiguous 'N'
bases to exercise the N-replacement path (asindex.c:53-60).
"""

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("length", type=int)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fasta", type=str, default=None,
                    help="emit FASTA with this sequence name")
    ap.add_argument("--n-frac", type=float, default=0.0)
    ap.add_argument("--line", type=int, default=70)
    a = ap.parse_args()

    rng = np.random.default_rng(a.seed)
    chars = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, a.length)].copy()
    if a.n_frac > 0:
        chars[rng.random(a.length) < a.n_frac] = ord("N")
    s = chars.tobytes().decode()
    out = sys.stdout
    if a.fasta:
        out.write(f">{a.fasta}\n")
        for i in range(0, len(s), a.line):
            out.write(s[i:i + a.line] + "\n")
    else:
        out.write(s + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
