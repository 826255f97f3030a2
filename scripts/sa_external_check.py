"""Validate + time the external-memory SA build at mid scale (dev tool).

Builds a random ACGT text of --mb Mchars, runs the blocked external
builder with a --ram-mb budget, byte-compares against the in-RAM SA-IS,
and prints both wall times.

Usage: python scripts/sa_external_check.py [--mb 50] [--ram-mb 64]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from longreadmapper_tpu import native
from longreadmapper_tpu.formats.ui40 import read_sa5
from longreadmapper_tpu.index.sa_external import sa_build_external


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=50)
    ap.add_argument("--ram-mb", type=int, default=64)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args(argv)

    n = args.mb * 1_000_000
    rng = np.random.default_rng(args.seed)
    text = np.empty(n + 1, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for s in range(0, n, 1 << 24):
        m = min(1 << 24, n - s)
        text[s:s + m] = bases[rng.integers(0, 4, m, dtype=np.uint8)]
    text[n] = ord("$")

    td = tempfile.mkdtemp(prefix="lrm_saext_")
    p = os.path.join(td, "t.cat")
    text.tofile(p)

    t0 = time.time()
    sa_build_external(p, args.ram_mb << 20)
    t_ext = time.time() - t0
    blocks = -(-(n + 1) * 12 // (args.ram_mb << 20))
    print(f"external: {t_ext:.1f}s ({(n + 1) / t_ext / 1e6:.2f} Mchar/s, "
          f"~{blocks} blocks @ ram {args.ram_mb} MB)", flush=True)

    t0 = time.time()
    want = native.suffix_array(text)
    t_ram = time.time() - t0
    print(f"in-RAM:   {t_ram:.1f}s ({(n + 1) / t_ram / 1e6:.2f} Mchar/s)",
          flush=True)

    got = read_sa5(p + ".sa5")
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)
    print(f"EXACT: {n + 1} entries byte-identical; "
          f"ext/ram slowdown {t_ext / t_ram:.2f}x")
    os.unlink(p)
    os.unlink(p + ".sa5")
    os.rmdir(td)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
