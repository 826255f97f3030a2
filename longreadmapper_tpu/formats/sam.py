"""SAM emission replicating the reference record layout exactly.

Header (/root/reference/alnmain.c:62-75):
  @SQ\tSN:<name>\tLN:<len>       per mta entry
  @RG\tID:accaln<rg_id>\tSM:SM_data
  @PG\tID:accaln\tPN:accaln
`rg_id` is time(NULL) in the reference; we take it as a parameter (default 0)
for reproducibility (documented divergence).

Record (alnmain.c:500-525):
  QNAME FLAG RNAME POS(off+1) MAPQ CIGAR RNEXT('*') PNEXT(0) TLEN(0)
  SEQ QUAL ED:I:<ed>
Flags used: only 0x4 (unmapped) and 0x10 (reverse) (alnmain.c:466-474);
MAPQ is 255 when valid else 0 (alnmain.c:464-468).
SEQ is emitted as stored after in-place reverse-complement for strand==1
(alnmain.c:433-438) — i.e. reverse-strand hits print the reverse complement
of the original read.  We match that.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple


def cigar_string(ops: Sequence[Tuple[int, str]]) -> str:
    """Run-length ops [(count, op), ...] -> SAM CIGAR string."""
    if not ops:
        return "*"
    return "".join(f"{n}{op}" for n, op in ops)


def sam_header(mta: Iterable, rg_id: int = 0) -> str:
    lines: List[str] = []
    for m in mta:
        lines.append(f"@SQ\tSN:{m.seq_name}\tLN:{m.seq_len}")
    lines.append(f"@RG\tID:accaln{rg_id}\tSM:SM_data")
    lines.append("@PG\tID:accaln\tPN:accaln")
    return "\n".join(lines) + "\n"


def sam_record(
    qname: str,
    flag: int,
    rname: str,
    off: int,
    mapq: int,
    cigar: str,
    seq: str,
    qual: str,
    ed: int,
) -> str:
    return (
        f"{qname}\t{flag}\t{rname}\t{off + 1}\t{mapq}\t{cigar}\t*\t0\t0\t"
        f"{seq}\t{qual}\tED:I:{ed}\n"
    )
