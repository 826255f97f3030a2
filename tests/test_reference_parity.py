"""Byte-level index-artifact parity against the REFERENCE accidx binary.

Builds the reference's own index builder (asindex.c + fmidx + lchash +
pSAscan + divsufsort, with stubs for the absent gact/mlog submodules — see
scripts/build_reference_accidx.sh), runs it on an N-free FASTA, and asserts
that every artifact our `create_meta`/`sa_build`/`FMIndex`/`lc_build_from_sa`
pipeline writes is IDENTICAL byte-for-byte:

  .mta  .cat  .cat.sa5 (uint40 SA)  .cat.mfi (C/O/BWT/CSA)  .cat.lch

This is the strongest possible format-parity check (SURVEY.md §1 on-disk
ABI); N-containing references are excluded because the reference's
N-replacement uses srand48(time(NULL)) (asindex.c:53-60) and is not
reproducible even against itself.

Opt-in (builds a C toolchain target + a 268 MB hlen=12 table):
    LRM_REF_PARITY=1 python -m pytest tests/test_reference_parity.py -v
"""

import os
import subprocess

import numpy as np
import pytest

from conftest import write_fasta

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
ENABLED = os.environ.get("LRM_REF_PARITY", "") == "1"

pytestmark = pytest.mark.skipif(
    not (ENABLED and os.path.isdir(REF)),
    reason="set LRM_REF_PARITY=1 (and have /root/reference) to run")

ARTIFACTS = [".mta", ".cat", ".cat.sa5", ".cat.mfi", ".cat.lch"]


@pytest.fixture(scope="module")
def accidx(tmp_path_factory):
    out = tmp_path_factory.mktemp("refbuild")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "build_reference_accidx.sh")
    subprocess.run(["bash", script, str(out)], check=True,
                   capture_output=True)
    return str(out / "accidx")


def test_index_artifacts_bit_identical(accidx, tmp_path):
    rng = np.random.default_rng(99)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 30000))
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    for d in (ref_dir, our_dir):
        write_fasta(str(d / "g.fa"), [("chr1", genome)])

    subprocess.run([accidx, "g.fa"], cwd=ref_dir, check=True,
                   capture_output=True)

    from longreadmapper_tpu.formats.catmeta import create_meta, load_cat
    from longreadmapper_tpu.formats.lch import write_lch
    from longreadmapper_tpu.index.fmi import FMIndex, encode_bytes
    from longreadmapper_tpu.index.lchash import lc_build_from_sa
    from longreadmapper_tpu.index.sa import sa_build

    cwd = os.getcwd()
    os.chdir(our_dir)
    try:
        create_meta("g.fa", n_seed=0)
        sa = sa_build("g.fa.cat")
        fmi = FMIndex.build("g.fa.cat", o_ratio=32, csa_ratio=4, sa=sa)
        fmi.write("g.fa.cat")
        kl = lc_build_from_sa(fmi.sa, encode_bytes(load_cat("g.fa.cat")), 12)
        write_lch("g.fa.cat.lch", 12, kl)
    finally:
        os.chdir(cwd)

    for suffix in ARTIFACTS:
        a = (ref_dir / ("g.fa" + suffix)).read_bytes()
        b = (our_dir / ("g.fa" + suffix)).read_bytes()
        assert a == b, f"artifact g.fa{suffix} differs from reference accidx"
