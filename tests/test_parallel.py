"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from bwameme_tpu.parallel.dryrun import run_dryrun

    run_dryrun(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from bwameme_tpu.parallel.dryrun import run_dryrun

    run_dryrun(2)
