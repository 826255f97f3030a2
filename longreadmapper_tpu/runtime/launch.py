"""Multi-host distributed mapping launcher.

The reference scales across machines only by SLURM job arrays — one
independent process per parameter point (SURVEY.md P5).  The TPU-native
framework instead runs ONE logical mapper over a pod slice
(BASELINE.json configs: 1 chip -> 1 host -> N hosts at >= 90 % scaling):

  - `jax.distributed.initialize()` wires the hosts (honors the standard
    coordinator env vars / TPU metadata; no-ops for a single process);
  - every process parses its OWN stripe of the FASTQ (round-robin by
    batch index — host-local I/O, no central dispatcher);
  - the HBM-resident index is built once per host from the shared
    artifacts and replicated (or row-sharded over a `model` axis for
    genomes that exceed one chip's HBM — parallel/dist.shard_index);
  - each process emits SAM for its stripe to `<out>.part<k>`; process 0
    writes the header.  `cat out.sam.part*` is the final SAM (record
    order is by stripe, deterministic).
  - the sensitivity counter is psum'd over the data axis inside the
    sharded step, so the logged valid/total (alnmain.c:541) is global.

Single-process use degenerates to runtime/accaln.run_mapping semantics.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

from ..formats.sam import sam_header
from ..index.device import load_device_index
from ..models.mapper import TPUMapper
from ..utils.config import Params, read_params
from ..utils.log import new_logger
from .reads import chunks, load_read_batches


def init_distributed() -> tuple[int, int]:
    """Initialize jax.distributed when a coordinator is configured.

    Returns (process_index, process_count).  Controlled by the standard
    env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    or the TPU pod metadata); a lone process skips initialization."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if coord and nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    return jax.process_index(), jax.process_count()


def run_distributed(genome_path: str, reads_path: str,
                    params: Optional[Params] = None,
                    out_prefix: Optional[str] = None, rg_id: int = 0,
                    chunk_b: int = 0, shard_index_tables: bool = False,
                    verbose: bool = True) -> tuple[int, int]:
    """Map `reads_path` across every host/chip of the slice.

    Returns this process's (valid, total).  SAM goes to
    `<out_prefix>.part<process_index>` (stdout when out_prefix is None
    and the slice is a single process)."""
    pid, nproc = init_distributed()
    p = params or read_params()
    log = new_logger(verbose=verbose and pid == 0)

    t0 = log.vlog("process %d/%d: loading index for %s", pid, nproc,
                  genome_path)
    idx, meta, mta = load_device_index(genome_path)
    log.vlog("index loaded in %.2fs (n=%d)", log.elapse(t0), meta.n)

    if out_prefix is None and nproc == 1:
        out = sys.stdout
        close = False
    else:
        prefix = out_prefix or "out.sam"
        out = open(f"{prefix}.part{pid}", "w")
        close = True
    if pid == 0:
        out.write(sam_header(mta, rg_id))

    mapper = TPUMapper(idx, meta, mta, p, chunk_b=chunk_b)
    total = valid = 0
    for bi, batch in enumerate(load_read_batches(reads_path, p.batch_size)):
        if bi % nproc != pid:
            continue                       # round-robin batch striping
        for recs in mapper.map_stream(chunks(batch, mapper.B)):
            for rec in recs:
                if rec.valid:
                    valid += 1
                out.write(rec.to_sam())
            total += len(recs)
    if close:
        out.close()
    if total:
        log.vlog("process %d sensitivity: %d/%d=%f", pid, valid, total,
                 valid / total)
    return valid, total
