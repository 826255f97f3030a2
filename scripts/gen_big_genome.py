#!/usr/bin/env python
"""Fast synthetic genome-scale FASTA generator (dna_txt_gen.py's big sibling).

Writes a multi-contig random ACGT FASTA at GB scale in vectorized numpy
chunks (~1 GB/min single-core) — the fixture generator for the >2^31 .cat
genome-scale tests and benches (the reference's own scale experiments ran
hg19: /root/reference/scripts/gen-sbatch-scripts.py:74-111).

Usage: gen_big_genome.py --out big.fa --size 2500000000 [--contigs 8]
                         [--seed 7] [--line-len 80]
"""

import argparse
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_contig(fp, name: str, length: int, rng, line_len: int,
                 chunk: int = 1 << 26) -> None:
    fp.write(f">{name}\n".encode())
    # emit in chunks that are multiples of line_len so every chunk is a
    # clean (rows, line_len + 1) newline matrix
    chunk = max(line_len, (chunk // line_len) * line_len)
    done = 0
    while done < length:
        m = min(chunk, length - done)
        seq = BASES[rng.integers(0, 4, m, dtype=np.uint8)]
        full = (m // line_len) * line_len
        if full:
            rows = seq[:full].reshape(-1, line_len)
            out = np.empty((rows.shape[0], line_len + 1), dtype=np.uint8)
            out[:, :line_len] = rows
            out[:, line_len] = ord("\n")
            fp.write(out.tobytes())
        if m > full:
            fp.write(seq[full:].tobytes() + b"\n")
        done += m


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, required=True,
                    help="total bases across all contigs")
    ap.add_argument("--contigs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--line-len", type=int, default=80)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    per = args.size // args.contigs
    with open(args.out, "wb") as fp:
        for i in range(args.contigs):
            size = per if i < args.contigs - 1 else args.size - per * (args.contigs - 1)
            write_contig(fp, f"chr{i + 1}", size, rng, args.line_len)
    return 0


if __name__ == "__main__":
    sys.exit(main())
