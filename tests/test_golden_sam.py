"""SAM parity vs COMMITTED golden fixtures from the reference binary.

tests/golden/*.sam.gz were produced once by tools/gen_golden_fixtures.py
running the actual reference bwa-meme binary (build recipe:
tools/build_reference.sh) under `-K 100000000 -t 1`. This replays the
same configs through this framework's CLI and requires byte-identical
alignment records — the reference's own correctness contract
(reference: README.md:80-92), with no environment setup needed.

test_reference_parity.py remains the live-binary variant (option fuzz,
multiple backends) for sessions where BWAMEME_REF_BIN is set.
"""

import gzip
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

import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")

# se_Y + pe_default always run; the rest are the FULL sweep, opt-in via
# BWAMEME_FULL_GOLDEN=1 (this host's single throttled vCPU makes each
# config a multi-minute subprocess run)
FULL = os.environ.get("BWAMEME_FULL_GOLDEN", "0") == "1"
CONFIGS = [
    ("se_Y", ["-Y"], "se", True),
    ("se_default", [], "se", FULL),
    ("se_all", ["-a", "-Y"], "se", FULL),
    ("se_T40", ["-T", "40"], "se", FULL),
    ("se_5", ["-5", "-Y"], "se", FULL),
    ("se_x_intractg", ["-x", "intractg"], "se", FULL),
    ("pe_Y", ["-Y"], "pe", FULL),
    ("pe_default", [], "pe", True),
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    for name in ["ref.fa", "reads_se.fq", "reads_1.fq", "reads_2.fq"]:
        with gzip.open(os.path.join(GOLD, name + ".gz"), "rt") as f:
            (d / name).write_text(f.read())
    subprocess.run(
        [sys.executable, "-m", "bwameme_tpu.cli", "index", str(d / "ref.fa"),
         "-p", str(d / "idx")],
        check=True, capture_output=True, cwd="/root/repo", env=_ENV,
    )
    return d


@pytest.mark.parametrize("name,flags,mode,always", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_golden(workdir, name, flags, mode, always):
    if not always:
        pytest.skip("full golden sweep: set BWAMEME_FULL_GOLDEN=1")
    d = workdir
    reads = ([str(d / "reads_se.fq")] if mode == "se" else
             [str(d / "reads_1.fq"), str(d / "reads_2.fq")])
    ours = subprocess.run(
        [sys.executable, "-m", "bwameme_tpu.cli", "mem", "-K", "100000000",
         *flags, str(d / "idx"), *reads, "--engine", "host"],
        check=True, capture_output=True, text=True, cwd="/root/repo", env=_ENV,
    )
    got = [ln for ln in ours.stdout.splitlines() if not ln.startswith("@")]
    with gzip.open(os.path.join(GOLD, name + ".sam.gz"), "rt") as f:
        want = f.read().splitlines()
    assert got == want
