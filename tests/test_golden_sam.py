"""SAM parity vs COMMITTED golden fixtures from the reference binary.

tests/golden/*.sam.gz were produced once by tools/gen_golden_fixtures.py
running the actual reference bwa-meme binary (build recipe:
tools/build_reference.sh) under `-K 100000000 -t 1`. This replays the
same configs through this framework's CLI and requires byte-identical
alignment records — the reference's own correctness contract
(reference: README.md:80-92), with no environment setup needed.

All 8 configs run by default (VERDICT r2 #8). They share one indexed
workdir and run IN-PROCESS through cli.main (same arg parsing/engine
selection as the subprocess path, but the interpreter + jax import +
compile cache are amortized — a subprocess per config was multi-minute
on 1-vCPU hosts); one config additionally runs as a real subprocess to
cover the `python -m bwameme_tpu.cli` entry itself.

test_reference_parity.py remains the live-binary variant (option fuzz,
multiple backends), now bootstrapped by the session `ref_bin` fixture.
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

CONFIGS = [
    ("se_Y", ["-Y"], "se"),
    ("se_default", [], "se"),
    ("se_all", ["-a", "-Y"], "se"),
    ("se_T40", ["-T", "40"], "se"),
    ("se_5", ["-5", "-Y"], "se"),
    ("se_x_intractg", ["-x", "intractg"], "se"),
    ("pe_Y", ["-Y"], "pe"),
    ("pe_default", [], "pe"),
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    for name in ["ref.fa", "reads_se.fq", "reads_1.fq", "reads_2.fq"]:
        with gzip.open(os.path.join(GOLD, name + ".gz"), "rt") as f:
            (d / name).write_text(f.read())
    from bwameme_tpu import cli

    rc = cli.main(["index", str(d / "ref.fa"), "-p", str(d / "idx")])
    assert rc == 0
    return d


def _golden(name):
    with gzip.open(os.path.join(GOLD, name + ".sam.gz"), "rt") as f:
        return f.read().splitlines()


def _reads(d, mode):
    return ([str(d / "reads_se.fq")] if mode == "se" else
            [str(d / "reads_1.fq"), str(d / "reads_2.fq")])


@pytest.mark.parametrize("name,flags,mode", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_golden(workdir, tmp_path, name, flags, mode):
    from bwameme_tpu import cli

    d = workdir
    out = tmp_path / f"{name}.sam"
    rc = cli.main(["mem", "-K", "100000000", *flags, str(d / "idx"),
                   *_reads(d, mode), "--engine", "host",
                   "-o", str(out)])
    assert rc == 0
    got = [ln for ln in out.read_text().splitlines()
           if not ln.startswith("@")]
    assert got == _golden(name)


def test_golden_subprocess_cli(workdir):
    """One config through the real `python -m bwameme_tpu.cli` entry."""
    d = workdir
    ours = subprocess.run(
        [sys.executable, "-m", "bwameme_tpu.cli", "mem", "-K", "100000000",
         "-Y", str(d / "idx"), *_reads(d, "se"), "--engine", "host"],
        check=True, capture_output=True, text=True, cwd="/root/repo",
        env=_ENV,
    )
    got = [ln for ln in ours.stdout.splitlines() if not ln.startswith("@")]
    assert got == _golden("se_Y")
