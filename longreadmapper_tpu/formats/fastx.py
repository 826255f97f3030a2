"""Streaming FASTA/FASTQ parser (kseq.h equivalent).

The reference uses klib's kseq macro parser over gzFile
(/root/reference/kseq.h, instantiated at asindex.c:10 and accaln.h:21).
Behavioral contract replicated:
  - record name = text up to the first whitespace after '>'/'@'
  - multi-line sequences concatenated
  - FASTQ quality read until it reaches sequence length
  - transparent gzip support (detected by magic bytes)
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, Optional


@dataclass
class FastxRecord:
    name: str
    seq: str
    qual: Optional[str] = None  # None for FASTA

    def __len__(self) -> int:
        return len(self.seq)


def _open_maybe_gz(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "r")


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Yield records from a (possibly gzipped) FASTA or FASTQ file."""
    with _open_maybe_gz(path) as f:
        line = f.readline()
        while line:
            line = line.rstrip("\n")
            if not line:
                line = f.readline()
                continue
            if line[0] == ">":
                name = line[1:].split(None, 1)[0] if len(line) > 1 else ""
                chunks = []
                line = f.readline()
                while line and line[0] not in ">@":
                    chunks.append(line.strip())
                    line = f.readline()
                yield FastxRecord(name=name, seq="".join(chunks))
            elif line[0] == "@":
                name = line[1:].split(None, 1)[0] if len(line) > 1 else ""
                chunks = []
                line = f.readline()
                while line and line[0] != "+":
                    chunks.append(line.strip())
                    line = f.readline()
                seq = "".join(chunks)
                # '+' separator line consumed; read qual until len(seq)
                quals = []
                qlen = 0
                while qlen < len(seq):
                    line = f.readline()
                    if not line:
                        break
                    q = line.strip()
                    quals.append(q)
                    qlen += len(q)
                yield FastxRecord(name=name, seq=seq, qual="".join(quals))
                line = f.readline()
            else:
                # skip garbage line
                line = f.readline()


ENCODE_LUT = None


def _encode_lut():
    global ENCODE_LUT
    if ENCODE_LUT is None:
        import numpy as np

        lut = np.full(256, 4, dtype=np.uint8)  # everything unknown -> 4 (N)
        for i, ch in enumerate("ACGT"):
            lut[ord(ch)] = i
            lut[ord(ch.lower())] = i
        ENCODE_LUT = lut
    return ENCODE_LUT


def encode_seq(seq: str):
    """ASCII sequence -> 2-bit codes (A0 C1 G2 T3, other=4) as uint8 array."""
    import numpy as np

    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return _encode_lut()[raw]


def decode_seq(codes) -> str:
    import numpy as np

    alpha = np.frombuffer(b"ACGTN", dtype=np.uint8)
    return alpha[np.asarray(codes)].tobytes().decode("ascii")
