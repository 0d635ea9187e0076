"""CLI end-to-end: index + mem subcommands via the real entry point."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(42)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 40000))
    fa = d / "ref.fa"
    with open(fa, "w") as f:
        f.write(">chrC test\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i : i + 60] + "\n")
    # reads sampled from the reference (SE + PE files)
    r1 = d / "reads_1.fq"
    r2 = d / "reads_2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(8):
            p = int(rng.integers(0, 39000))
            s1 = seq[p : p + 100]
            isz = 300
            s2f = seq[p + isz - 100 : p + isz]
            s2 = s2f.translate(str.maketrans("ACGT", "TGCA"))[::-1]
            f1.write(f"@p{i}\n{s1}\n+\n{'I'*100}\n")
            f2.write(f"@p{i}\n{s2}\n+\n{'I'*100}\n")
    return d, seq


def run_cli(args, cwd, extra_env=None):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "bwameme_tpu.cli", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=300,
    )


def test_cli_index_and_mem_se(workdir):
    d, seq = workdir
    r = run_cli(["index", "ref.fa"], d)
    assert r.returncode == 0, r.stderr
    assert (d / "ref.fa.meme").is_dir()
    assert (d / "ref.fa.pac").exists()

    r = run_cli(["mem", "--engine", "host", "ref.fa", "reads_1.fq"], d)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln and not ln.startswith("@")]
    assert len(lines) >= 8
    hdr = [ln for ln in r.stdout.splitlines() if ln.startswith("@SQ")]
    assert hdr == ["@SQ\tSN:chrC\tLN:40000"]
    # all reads mapped with full-length cigars
    for ln in lines:
        f = ln.split("\t")
        assert not (int(f[1]) & 0x4), ln
        assert f[5] == "100M", ln


def test_cli_mem_pe(workdir):
    d, seq = workdir
    if not (d / "ref.fa.meme").is_dir():
        run_cli(["index", "ref.fa"], d)
    r = run_cli(
        ["mem", "--engine", "host", "ref.fa", "reads_1.fq", "reads_2.fq"], d
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln and not ln.startswith("@")]
    assert len(lines) >= 16
    flags = [int(ln.split("\t")[1]) for ln in lines]
    assert all(fl & 0x1 for fl in flags)  # all paired
    assert any(fl & 0x40 for fl in flags) and any(fl & 0x80 for fl in flags)


@pytest.mark.slow
def test_cli_mem_shards(workdir):
    """--shards N: the CLI runs the device engine over an index-sharded
    mesh (virtual CPU devices) and emits the same SAM as single-device."""
    d, seq = workdir
    if not (d / "ref.fa.meme").is_dir():
        run_cli(["index", "ref.fa"], d)

    def body(r):
        assert r.returncode == 0, r.stderr
        return [ln for ln in r.stdout.splitlines()
                if ln and not ln.startswith("@")]

    extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    one = body(run_cli(["mem", "--batch", "16", "ref.fa", "reads_1.fq"], d,
                       extra_env=extra))
    two = body(run_cli(["mem", "--batch", "16", "--shards", "2", "ref.fa",
                        "reads_1.fq"], d, extra_env=extra))
    assert "sharded over 2 devices" not in one
    assert one == two
    for ln in two:
        assert ln.split("\t")[5] == "100M", ln
