"""End-of-round benchmark: end-to-end mapping throughput on one chip.

Prints ONE JSON line:
  {"metric": "reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": N / <numpy-oracle reads/s on this host>}

The reference publishes no numbers (BASELINE.md) and its ALIGNER binary
cannot be built (the gact/ submodule is absent upstream; the index builder
CAN be — see scripts/build_reference_accidx.sh and the byte-parity test),
so the recorded baseline is the pure-Python/numpy oracle transcription of
the reference pipeline running on this host's CPU — the same work, same
parameters, same results.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cc"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

GENOME_MB = int(os.environ.get("GMB", 4))
N_READS = int(os.environ.get("NREADS", 16384))
READ_LEN = int(os.environ.get("RLEN", 1000))
ERR = float(os.environ.get("ERR", 0.03))
# hlen is an INDEX-BUILD tuning knob our framework surfaces (the
# reference hard-codes 12, asindex.c:142): expand-and-verify's dominant
# sa_ctx gather scales with the vote-slot budget, which scales with the
# lchash background rate n/4^hlen — the deeper table trades 4.3 GB HBM
# for a 112 -> 80 slot budget (measured r4: 31.3k vs 28.2k reads/s at
# hlen 12).  SAM output is hlen-independent (oracle runs the same hlen).
# default = the production auto-hlen rule (utils/config.auto_hlen): the
# bench genome and `cli index` now land on the same table depth
HLEN = int(os.environ.get("HLEN", 14))
CHUNK_B = int(os.environ.get("CHUNK_B", 2048))
PASSES = int(os.environ.get("PASSES", 5))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _ensure_backend_reachable() -> tuple:
    """A down axon tunnel hangs `import jax` indefinitely (the sitecustomize
    dials the relay).  Probe in a timeboxed subprocess; on failure re-exec
    onto the CPU backend with a reduced workload so the driver still gets
    its JSON line (marked, not comparable to TPU rows).

    The probe also times a D2H round trip: a DEGRADED link (2026-08-19
    mode: devices() answers, fetches stall for minutes) makes TPU numbers
    a link artifact — returned so the JSON row can say so."""
    if os.environ.get("_LRM_BENCH_CPU"):
        return "cpu-fallback", None
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return "local", None  # no tunnel configured; whatever jax picks is ok
    import subprocess
    # the link FLAPS on a minutes scale (watch logs 2026-08-20: healthy
    # probe at 11:09, dead at 11:10, healthy 11:17) — retry the probe a
    # few times before surrendering to the CPU fallback, so a driver
    # capture that lands in a flap still gets a real TPU row
    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import time, jax, numpy as np;"
                 "print(jax.devices());"
                 "x = jax.jit(lambda a: a @ a)("
                 "jax.device_put(np.ones((64, 64), np.float32)));"
                 "t0 = time.time(); np.asarray(x);"
                 "print('D2H', time.time() - t0)"],
                capture_output=True, text=True, timeout=240)
            if r.returncode == 0:
                d2h = None
                for tok in r.stdout.split():
                    try:
                        d2h = float(tok)
                    except ValueError:
                        pass
                return "tpu", d2h
        except subprocess.TimeoutExpired:
            pass
        if attempt < 2:
            log(f"TPU probe failed (attempt {attempt + 1}/3) -- "
                f"retrying in 90s")
            time.sleep(90)
    log("TPU tunnel unreachable -- re-exec on CPU backend (reduced size)")
    # LRM_PALLAS_DIRS must not survive the fallback: Pallas kernels only
    # lower in interpret mode on CPU (round-4 bench_pallas crashed here)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "LRM_PALLAS_DIRS")}
    env.update({"_LRM_BENCH_CPU": "1", "JAX_PLATFORMS": "cpu",
                "NREADS": os.environ.get("NREADS", "2048"),
                "PASSES": os.environ.get("PASSES", "2")})
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


def main():
    global N_READS, PASSES
    backend_note, probe_d2h = _ensure_backend_reachable()
    # A DEGRADED link (D2H stalls of 60-150 s observed 2026-08-19/20)
    # makes the full 16k x 5-pass run take hours — the driver would get
    # no JSON line at all.  Shrink the workload so a (marked) row always
    # lands; explicit NREADS/PASSES env overrides are respected.
    full_nreads, full_passes = N_READS, PASSES
    shrunk = False
    if probe_d2h is not None and probe_d2h > 10:
        # PROVISIONAL shrink — r5 session-2 data shows the probe's D2H
        # stall is usually connection setup, not steady-state (a 60 s
        # probe ran warm passes at full speed), so a post-warmup timed
        # calibration chunk below restores the full workload when the
        # measured chunk rate is healthy
        if "NREADS" not in os.environ:
            # scale the shrink by read length (a 10 kb run moves 10x the
            # bases per read)
            N_READS = min(N_READS, max(512, 4096 * 1000 // READ_LEN))
            shrunk = True
        if "PASSES" not in os.environ:
            PASSES = min(PASSES, 2)
        log(f"degraded link probe (D2H {probe_d2h:.0f}s): provisional "
            f"workload NREADS={N_READS} PASSES={PASSES}")
    import jax
    from longreadmapper_tpu.formats.catmeta import create_meta, load_cat
    from longreadmapper_tpu.index.fmi import FMIndex
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build
    from longreadmapper_tpu.models.mapper import TPUMapper
    from longreadmapper_tpu.oracle.refpipe import OracleMapper
    from longreadmapper_tpu.utils.config import Params

    log("devices:", jax.devices())
    # BENCH_CACHE (default 1): reuse a deterministic per-config dir so
    # repeated invocations skip the host index build (the hlen=14 lchash
    # build alone costs ~3 min on this 1-core host); the genome/reads are
    # seeded and the devidx cache is fingerprint+version checked, so the
    # cached artifacts are identical to a fresh build.  BENCH_CACHE=0
    # forces a from-scratch build in a fresh tempdir.
    if os.environ.get("BENCH_CACHE", "1") == "1":
        tmp = f"/tmp/lrm_bench_cache_g{GENOME_MB}_h{HLEN}"
        os.makedirs(tmp, exist_ok=True)
    else:
        tmp = tempfile.mkdtemp(prefix="lrm_bench_")
    rng = np.random.default_rng(2026)

    # --- data
    n = GENOME_MB * 1_000_000
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
    fa = os.path.join(tmp, "ref.fa")
    if not (os.path.exists(fa) and os.path.getsize(fa) > n):
        with open(fa, "w") as f:
            f.write(">chr1\n")
            step = 1 << 16
            for i in range(0, n, step):
                f.write(genome[i:i + step] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    alpha = "ACGT"
    # generate the FULL read set when provisionally shrunk — the
    # post-warmup calibration may restore the full workload
    for i in range(full_nreads if shrunk else N_READS):
        p = int(rng.integers(0, n - READ_LEN))
        s = genome[p:p + READ_LEN]
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        chars = np.frombuffer(s.encode(), np.uint8).copy()
        mask = rng.random(READ_LEN) < ERR
        chars[mask] = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, int(mask.sum()))]
        reads.append((f"r{i}", chars.tobytes().decode(), "I" * READ_LEN))

    # --- index build: write the full artifact set once, then load through
    # the production `load_device_index` path (its devidx cache makes
    # BENCH_CACHE reruns I/O-bound — the hlen-14 host lchash build alone
    # costs ~200 s per invocation otherwise)
    params = Params(hlen=HLEN)
    prefix = fa + ".cat"
    artifacts = (fa + ".mta", prefix, prefix + ".sa5", prefix + ".mfi",
                 prefix + ".lch")
    if not all(os.path.exists(p) for p in artifacts):
        from longreadmapper_tpu.formats.lch import write_lch
        from longreadmapper_tpu.index.fmi import encode_bytes
        t0 = time.time()
        create_meta(fa, n_seed=0)
        sa = sa_build(prefix)
        fmi_b = FMIndex.build(prefix, sa=sa)
        fmi_b.write(prefix)
        log(f"host index build (SA+FMI): {time.time() - t0:.1f}s")
        t0 = time.time()
        kl = lc_build_from_sa(sa, encode_bytes(load_cat(prefix)), HLEN)
        write_lch(prefix + ".lch", HLEN, kl)
        log(f"SA-derived lchash build (4^{HLEN} k-mers): "
            f"{time.time() - t0:.1f}s")
        del sa, fmi_b, kl
    t0 = time.time()
    from longreadmapper_tpu.index.device import load_device_index
    idx, meta, mta = load_device_index(fa)
    log(f"device index load: {time.time() - t0:.1f}s "
        f"(hlen={meta.hlen}, n={meta.n})")

    # BENCH_BUILD_ONLY=1: stop after the artifact set + devidx cache are
    # on disk.  Lets a host-side prewarm (CPU backend, tunnel untouched)
    # rebuild /tmp caches after a box restart so the real TPU capture is
    # I/O-bound instead of paying the ~200 s hlen-14 lchash build.
    if os.environ.get("BENCH_BUILD_ONLY"):
        log(f"build-only: artifact set + devidx cache ready under {tmp}")
        return

    mapper = TPUMapper(idx, meta, mta, params, chunk_b=CHUNK_B)

    # --- warmup (compile)
    t0 = time.time()
    recs = mapper.map_chunk(reads[:CHUNK_B])
    log(f"warmup chunk (compile+run): {time.time() - t0:.1f}s; "
        f"valid {sum(r.valid for r in recs)}/{CHUNK_B}")

    # --- calibration: decide the final workload from MEASURED warm-chunk
    # throughput, not the probe (see the provisional-shrink note above)
    if shrunk:
        t0 = time.time()
        mapper.map_chunk(reads[:CHUNK_B])
        cal_rps = min(CHUNK_B, len(reads)) / (time.time() - t0)
        floor = 1500.0 * 1000.0 / READ_LEN   # ~20x under healthy e2e
        if cal_rps >= floor:
            N_READS, PASSES = full_nreads, full_passes
            shrunk = False
            log(f"calibration chunk {cal_rps:.0f} reads/s >= {floor:.0f} "
                f"floor: probe stall was setup-only, full workload "
                f"NREADS={N_READS} PASSES={PASSES}")
        else:
            log(f"calibration chunk {cal_rps:.0f} reads/s < {floor:.0f} "
                f"floor: link truly degraded, keeping reduced workload")

    # --- timed (device/host overlapped stream); five passes, report the
    # steady-state (fastest) one — the tunneled host link's throughput
    # drifts by up to 2x between runs
    # the timed loop runs the PRODUCTION output path (SAM text, same as
    # `cli map`) — the reference's unit of work is reads -> SAM records
    best_dt, valid = None, 0
    for _ in range(PASSES):
        mapper.phase_s = {k: 0.0 for k in mapper.phase_s}
        t0 = time.time()
        total = valid = 0
        chunk_iter = (reads[s:s + CHUNK_B]
                      for s in range(0, N_READS, CHUNK_B))
        sam_bytes = 0
        for text, n_recs, n_valid in mapper.map_stream_sam(chunk_iter):
            sam_bytes += len(text)
            valid += n_valid
            total += n_recs
        dt = time.time() - t0
        ph = " ".join(f"{k}={v:.2f}s" for k, v in mapper.phase_s.items())
        log(f"pass: {dt:.2f}s ({total / dt:.0f} reads/s) host phases: {ph}")
        best_dt = dt if best_dt is None else min(best_dt, dt)
    dt = best_dt
    rps = total / dt
    from longreadmapper_tpu.models.mapper import _bucket_len
    bcfg = mapper._steps[_bucket_len(READ_LEN)][0]
    cells = total * READ_LEN * (2 * bcfg.W + 1)
    log(f"mapped {total} reads in {dt:.2f}s -> {rps:.1f} reads/s "
        f"(valid {valid}/{total}); DP ~{cells / dt / 1e9:.2f} Gcells/s")

    # --- oracle baseline (few reads, extrapolate)
    from longreadmapper_tpu.formats.lch import read_lch
    fmi = FMIndex.read(prefix, with_sa=True)
    o_hlen, kl = read_lch(prefix + ".lch")
    cat = load_cat(prefix)
    oracle = OracleMapper(fmi, kl, o_hlen, cat, mta, params)
    t0 = time.time()
    n_o = 3
    for name, s, _ in reads[:n_o]:
        oracle.map_read(s)
    o_rps = n_o / (time.time() - t0)
    log(f"oracle baseline: {o_rps:.2f} reads/s")

    row = {
        "metric": "reads_per_s_per_chip",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / o_rps, 2),
    }
    if READ_LEN != 1000:        # long-read rows are self-describing
        row.update(read_len=READ_LEN, sensitivity=round(valid / total, 4))
    if backend_note == "cpu-fallback":
        row["note"] = ("TPU tunnel unreachable; CPU-backend fallback -- "
                       "NOT comparable to TPU rows")
    elif shrunk:
        row["note"] = (f"TPU link DEGRADED at capture (D2H probe "
                       f"{probe_d2h:.0f}s; calibration confirmed) -- "
                       f"value is a link artifact, see BASELINE.md for "
                       f"clean runs")
    elif probe_d2h is not None and probe_d2h > 10:
        row["note"] = (f"TPU link flapped at probe (D2H {probe_d2h:.0f}s) "
                       f"-- calibration passed, full workload ran; value "
                       f"may still understate a clean link (BASELINE.md)")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
