"""Two-process multi-host protocol test (parallel/multihost.py).

Heavy (spawns 2 jax.distributed CPU processes, each compiling a 4-device
mesh engine — ~4 min on a 1-vCPU host), so env-gated:

    BWAMEME_TEST_MULTIHOST=1 python -m pytest tests/test_multihost.py

Asserts: jax.distributed forms the 2x4 global runtime, a global-mesh
psum crosses processes (Gloo), FASTQ-scatter/SAM-gather yields SAM
byte-identical to the single-process pipeline for SE and PE.
Measured green 2026-08-20: "[multihost] OK: 2 processes x 4 devices,
96 SE + 64 PE records byte-identical in 233s".
"""

import os

import pytest


@pytest.mark.skipif(os.environ.get("BWAMEME_TEST_MULTIHOST") != "1",
                    reason="env-gated: set BWAMEME_TEST_MULTIHOST=1")
def test_two_process_multihost():
    from bwameme_tpu.parallel.multihost import run_multihost

    run_multihost(2)
