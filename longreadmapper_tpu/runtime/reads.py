"""Read-batch loading (reference: accaln.c:45-58 `reads_load` and the
batch/chunk loop at alnmain.c:302-330)."""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from ..formats.fastx import read_fastx

ReadTuple = Tuple[str, str, Optional[str]]  # (name, seq, qual)


def load_read_batches(path: str, batch_size: int) -> Iterator[List[ReadTuple]]:
    """Yield batches of up to `batch_size` reads from a FASTA/FASTQ file."""
    batch: List[ReadTuple] = []
    for rec in read_fastx(path):
        batch.append((rec.name, rec.seq, rec.qual))
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def chunks(batch: List[ReadTuple], size: int) -> Iterator[List[ReadTuple]]:
    for i in range(0, len(batch), size):
        yield batch[i:i + size]
