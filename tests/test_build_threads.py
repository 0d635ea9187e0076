"""Threaded index build: results must be BIT-identical at any thread count
(BWAMEME_BUILD_THREADS). The parallel decompositions in native/sais.cpp and
native/hostkernels.cpp preserve the serial arithmetic order per output
element — the analog of the reference's deterministic OpenMP build passes
(reference: src/Learnedindex.cpp:301, README.md:69-71)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from bwameme_tpu.index.suffix_array import (build_suffix_array_doubling,
                                            build_suffix_array_native)


def _sa_native_ok():
    return build_suffix_array_native(np.zeros(4, np.uint8)) is not None


@pytest.mark.skipif(not _sa_native_ok(), reason="no native toolchain")
def test_sais_thread_parity():
    rng = np.random.default_rng(3)
    x = np.concatenate([
        np.zeros(2000, np.uint8),
        rng.integers(0, 4, 120000).astype(np.uint8),
        np.full(1500, 3, np.uint8),
    ])
    x[60000:70000] = x[10000:20000]  # repeat
    want = build_suffix_array_doubling(x)
    code = (
        "import numpy as np;"
        "from bwameme_tpu.index.suffix_array import build_suffix_array_native;"
        "import sys; x = np.load(sys.argv[1]);"
        "np.save(sys.argv[2], build_suffix_array_native(x))"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        xin = os.path.join(d, "x.npy")
        np.save(xin, x)
        for t in ("1", "5"):
            out = os.path.join(d, f"sa{t}.npy")
            env = dict(os.environ, BWAMEME_BUILD_THREADS=t)
            subprocess.run([sys.executable, "-c", code, xin, out],
                           check=True, env=env)
            got = np.load(out)
            assert np.array_equal(got, want), f"threads={t}"


@pytest.mark.skipif(not _sa_native_ok(), reason="no native toolchain")
def test_full_build_thread_parity():
    """Whole build_index (SA + keys + ISA + P-RMI) digests identically at
    1 and 4 threads."""
    code = r"""
import numpy as np, hashlib
from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
rng = np.random.default_rng(11)
n = 200000
c = rng.integers(0, 4, n).astype(np.uint8)
c[50000:60000] = c[10000:20000]
bns = bntseq.BntSeq(l_pac=n, contigs=[bntseq.Contig("c","",0,n,0)], ambs=[],
                    code=c)
idx = build_index(bns, rmi_bits=10)
h = hashlib.sha256()
for a in (idx.sa, idx.key_hi, idx.key_lo, idx.isa, idx.rmi_alpha,
          idx.rmi_beta, idx.rmi_err_lo, idx.rmi_err_hi, idx.rmi_leaf_start):
    h.update(np.ascontiguousarray(a).tobytes())
print(h.hexdigest())
"""
    digests = set()
    for t in ("1", "4"):
        env = dict(os.environ, BWAMEME_BUILD_THREADS=t)
        out = subprocess.run([sys.executable, "-c", code], check=True,
                             env=env, capture_output=True, text=True)
        digests.add(out.stdout.strip().splitlines()[-1])
    assert len(digests) == 1, digests
