"""Multi-device tests on the virtual 8-device CPU mesh.

run_dryrun(8) is the full-pipeline validation (VERDICT #1): SE and PE
alignment through seeding/chaining/extension/pairing/finalization with the
index sharded over the mesh, SAM asserted identical to the single-device
pipeline, plus a 1/2/8-shard seeding agreement + scaling probe.
"""

import jax
import pytest


def test_dryrun_multichip_full_pipeline():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from bwameme_tpu.parallel.dryrun import run_dryrun

    run_dryrun(8)
