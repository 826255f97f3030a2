"""Distributed-launcher tests: the collective-backed multi-host path.

The reference's only cluster story is SLURM job arrays of independent
processes (SURVEY.md P5); these tests pin down what replaces it — ONE
logical mapper over a ('data', 'model') mesh with a psum'd sensitivity
counter — including a REAL 2-process run wired through jax.distributed
(Gloo CPU collectives), the smallest faithful model of a pod slice.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from longreadmapper_tpu.formats.catmeta import create_meta
from longreadmapper_tpu.formats.lch import write_lch
from longreadmapper_tpu.index.fmi import FMIndex
from longreadmapper_tpu.index.lchash import lc_build_host
from longreadmapper_tpu.index.sa import sa_build
from longreadmapper_tpu.utils.config import Params

from conftest import make_genome, sample_reads, write_fasta, write_fastq

HLEN = 6


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Persisted index artifacts + a FASTQ, shared by every launcher run."""
    tmp = tmp_path_factory.mktemp("dist")
    rng = np.random.default_rng(91)
    genome = make_genome(rng, 20000)
    fa = str(tmp / "ref.fa")
    write_fasta(fa, [("chr1", genome)])
    params = Params(hlen=HLEN, seed_len=20, thres=300, batch_size=64)
    create_meta(fa, n_seed=params.n_seed)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, o_ratio=params.o_ratio,
                        csa_ratio=params.csa_ratio, sa=sa)
    fmi.write(prefix)
    kl = lc_build_host(fmi, HLEN)
    write_lch(prefix + ".lch", HLEN, kl)

    reads = sample_reads(rng, genome, 32, 150, error_rate=0.02)
    fq = str(tmp / "r.fq")
    write_fastq(fq, [(n, s, None) for n, s, *_ in reads])
    return dict(fa=fa, fq=fq, params=params, tmp=tmp)


def _single_process_sam(art) -> tuple[str, int, int]:
    from longreadmapper_tpu.runtime.accaln import run_mapping
    buf = io.StringIO()
    v, t = run_mapping(art["fa"], art["fq"], art["params"], buf, rg_id=0,
                       chunk_b=16, verbose=False)
    return buf.getvalue(), v, t


def test_mapdist_sharded_index_single_process(artifacts, tmp_path):
    """Launcher with --shard-index: the big gather tables row-sharded over
    a real 'model' mesh axis (GSPMD collectives), output byte-identical
    to the plain single-chip run and the device-side global valid counter
    equal to the host-side count."""
    from longreadmapper_tpu.runtime.launch import run_distributed

    want_sam, want_v, want_t = _single_process_sam(artifacts)
    prefix = str(tmp_path / "shard.sam")
    v, t = run_distributed(artifacts["fa"], artifacts["fq"],
                           artifacts["params"], out_prefix=prefix, rg_id=0,
                           chunk_b=16, shard_index_tables=True,
                           model_shards=2, verbose=False)
    assert (v, t) == (want_v, want_t)
    assert open(prefix + ".part0").read() == want_sam


def test_mapdist_two_processes(artifacts, tmp_path):
    """TWO jax processes (4 virtual CPU devices each) form one 8-device
    mesh via jax.distributed + Gloo; stripe-concatenated SAM must equal
    the single-process output and both processes must report the same
    GLOBAL psum'd sensitivity (VERDICT round-1 item 3)."""
    want_sam, want_v, want_t = _single_process_sam(artifacts)

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    prefix = str(tmp_path / "mp.sam")
    chunk_b = 16
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def launch(port):
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port), "4",
                 artifacts["fa"], artifacts["fq"], prefix, "0",
                 str(chunk_b)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
                text=True)
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
        return outs

    # XLA's Gloo CPU collectives hard-code a 30 s key-exchange deadline; on
    # a single-core host two fresh workers can drift past it while tracing/
    # compiling.  One tolerated warmup attempt fills both workers' persistent
    # compile caches, after which the real attempt stays well inside 30 s.
    outs = launch(12731)
    if any(rc != 0 for rc, _, _ in outs):
        outs = launch(12741)
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "WORKER_OK" in out, out
    # both processes log the same GLOBAL valid/total
    import re
    stats = [re.search(r"valid=(\d+) total=(\d+)", out).groups()
             for _, out, _ in outs]
    assert stats[0] == stats[1]
    assert (int(stats[0][0]), int(stats[0][1])) == (want_v, want_t)

    # merge the stripes: record order is chunk-major, process-slice minor
    # (each full chunk of 16 reads = 8 rows on p0 then 8 rows on p1)
    part0 = open(prefix + ".part0").read()
    part1 = open(prefix + ".part1").read()
    header = "".join(l + "\n" for l in part0.splitlines()
                     if l.startswith("@"))
    rec0 = [l + "\n" for l in part0.splitlines() if not l.startswith("@")]
    rec1 = [l + "\n" for l in part1.splitlines() if not l.startswith("@")]
    half = chunk_b // 2
    merged = header
    for c in range(0, len(rec0), half):
        merged += "".join(rec0[c:c + half]) + "".join(rec1[c:c + half])
    assert merged == want_sam


def test_mapdist_two_processes_sharded_tables(artifacts, tmp_path):
    """TWO processes AND row-sharded index tables at once (VERDICT r2 #9:
    round-2 sharded-tables coverage was single-process only): 8 virtual
    devices in a (data=2, model=4) mesh, the gather tables GSPMD-sharded
    over 'model' ACROSS the process boundary, stripe-merged SAM equal to
    the single-process output and the psum'd sensitivity global."""
    want_sam, want_v, want_t = _single_process_sam(artifacts)

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    prefix = str(tmp_path / "mps.sam")
    chunk_b = 16
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def launch(port):
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port), "4",
                 artifacts["fa"], artifacts["fq"], prefix, "1",
                 str(chunk_b), "4"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
                text=True)
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
        return outs

    outs = launch(12751)   # one tolerated cold-cache retry, as above
    if any(rc != 0 for rc, _, _ in outs):
        outs = launch(12761)
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "WORKER_OK" in out, out
    import re
    stats = [re.search(r"valid=(\d+) total=(\d+)", out).groups()
             for _, out, _ in outs]
    assert stats[0] == stats[1]
    assert (int(stats[0][0]), int(stats[0][1])) == (want_v, want_t)

    part0 = open(prefix + ".part0").read()
    part1 = open(prefix + ".part1").read()
    header = "".join(l + "\n" for l in part0.splitlines()
                     if l.startswith("@"))
    rec0 = [l + "\n" for l in part0.splitlines() if not l.startswith("@")]
    rec1 = [l + "\n" for l in part1.splitlines() if not l.startswith("@")]
    half = chunk_b // 2
    merged = header
    for c in range(0, len(rec0), half):
        merged += "".join(rec0[c:c + half]) + "".join(rec1[c:c + half])
    assert merged == want_sam


def test_mapdist_sharded_slim_index(artifacts, tmp_path):
    """--shard-index + --slim-index: the reduced-HBM layout (SA-only
    sa_ctx, text_pair verify windows) row-sharded over the 'model' axis —
    the configuration for the biggest sharded genomes.  Output must stay
    byte-identical to the flat single-chip run."""
    from longreadmapper_tpu.runtime.launch import run_distributed

    want_sam, want_v, want_t = _single_process_sam(artifacts)
    prefix = str(tmp_path / "slimshard.sam")
    v, t = run_distributed(artifacts["fa"], artifacts["fq"],
                           artifacts["params"], out_prefix=prefix, rg_id=0,
                           chunk_b=16, shard_index_tables=True,
                           model_shards=2, slim=True, verbose=False)
    assert (v, t) == (want_v, want_t)
    assert open(prefix + ".part0").read() == want_sam
