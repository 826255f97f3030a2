#!/usr/bin/env python
"""Clean single-process A/B of full map-step variants on the real chip.

Builds one 4 Mb index, packs one realistic read batch, then times each
variant's jitted step back-to-back (same process, no tunnel contention):
the column-walk traceback vs the per-word v-walk, at the default config.

Usage: [B=2048] [RL=1000] [REPS=20] python scripts/bench_step_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from longreadmapper_tpu.formats.catmeta import create_meta, load_cat, load_mta
from longreadmapper_tpu.formats.fastx import encode_seq
from longreadmapper_tpu.index.device import build_device_index
from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
from longreadmapper_tpu.index.lchash import lc_build_from_sa
from longreadmapper_tpu.index.sa import sa_build
from longreadmapper_tpu.mapping.pipeline import MapperConfig, make_map_step
from longreadmapper_tpu.utils.config import Params

B = int(os.environ.get("B", 2048))
RL = int(os.environ.get("RL", 1000))
REPS = int(os.environ.get("REPS", 20))
HLEN = int(os.environ.get("HLEN", 12))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *a, n=REPS):
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import tempfile
    from dataclasses import replace

    tmp = tempfile.mkdtemp(prefix="lrm_stepab_")
    rng = np.random.default_rng(7)
    n = 4_000_000
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    fa = os.path.join(tmp, "ref.fa")
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, n, 1 << 16):
            f.write(genome[i:i + (1 << 16)] + "\n")
    mta = create_meta(fa, n_seed=0)
    prefix = fa + ".cat"
    sa = sa_build(prefix)
    fmi = FMIndex.build(prefix, sa=sa)
    kl = lc_build_from_sa(fmi.sa, encode_bytes(load_cat(prefix)), HLEN)
    idx, meta = build_device_index(fmi, kl, HLEN, load_cat(prefix),
                                   load_mta(fa + ".mta"))
    params = Params(hlen=HLEN)
    L = 1024
    comp = str.maketrans("ACGT", "TGCA")
    codes = np.full((B, L), 4, dtype=np.int8)
    codes_rc = np.full((B, L), 4, dtype=np.int8)
    lens = np.full(B, RL, dtype=np.int32)
    for i in range(B):
        p = int(rng.integers(0, n - RL))
        s = genome[p:p + RL]
        if i % 2:
            s = s.translate(comp)[::-1]
        ch = np.frombuffer(s.encode(), np.uint8).copy()
        mask = rng.random(RL) < 0.03
        ch[mask] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(mask.sum()))]
        c = encode_seq(ch.tobytes().decode())
        codes[i, :RL] = c
        codes_rc[i, :RL] = np.where(c[::-1] < 4, 3 - c[::-1], c[::-1])
    limits = ((params.error_rate * lens.astype(np.float64)) * 2
              ).astype(np.int32)
    args = tuple(map(jnp.asarray, (codes, codes_rc, lens, limits)))

    cfg1 = MapperConfig.from_params(params, meta, B=B, L=L)
    log(f"cfg: vote_slots={cfg1.vote_slots} tb_cols={cfg1.tb_cols}")
    variants = [("c-walk", replace(cfg1, tb_cols=True)),
                ("v-walk", replace(cfg1, tb_cols=False))]
    for name, cfg in variants:
        step = make_map_step(cfg)
        t = timeit(lambda: step(idx, *args))
        log(f"step[{name}]: {t*1e3:.1f} ms -> {B/t:.0f} reads/s "
            f"(x{REPS} reps)")


if __name__ == "__main__":
    main()
