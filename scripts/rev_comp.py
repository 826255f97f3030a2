#!/usr/bin/env python
"""Reverse-complement utility — the reference's rev-comp.py check tool.

Reads sequences (one per line, or FASTA) on stdin or from a file and writes
their reverse complements; `--check A B` verifies B == revcomp(A).
"""

import argparse
import sys

_COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default="-")
    ap.add_argument("--check", nargs=2, metavar=("FWD", "REV"))
    a = ap.parse_args()
    if a.check:
        ok = revcomp(a.check[0]) == a.check[1]
        print("OK" if ok else "MISMATCH")
        return 0 if ok else 1
    src = sys.stdin if a.path == "-" else open(a.path)
    for line in src:
        line = line.rstrip("\n")
        if not line or line.startswith(">"):
            print(line)
        else:
            print(revcomp(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
