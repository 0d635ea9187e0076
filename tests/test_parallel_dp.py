"""2-D dp x idx mesh tests (parallel/dp.py): read batches sharded across
dp rows, the index sharded over each row's idx sub-mesh. SAM must be
byte-identical to the single-device host-oracle pipeline.

Split from the dryrun (which now runs the dp SE stage only when its
budget allows) so the dp PE path keeps differential coverage.
"""

import jax
import pytest


def _dp_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from bwameme_tpu.parallel.dp import make_dp_mesh

    return make_dp_mesh(2, 2, jax.devices()[:4])


@pytest.fixture(scope="module")
def dp_parts(par_workload):
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine

    idx, _, _ = par_workload
    mesh = _dp_mesh()

    def factory_for(opt):
        def factory(row_mesh, _opt=opt):
            return DeviceSeedingEngine(idx, _opt, max_read_len=160,
                                       lanes=128, mesh=row_mesh)
        return factory

    return mesh, factory_for


@pytest.mark.slow
def test_dp_mesh_se(par_workload, par_oracle, dp_parts):
    from bwameme_tpu.parallel.dp import DataParallelAligner

    idx, se_reads, _ = par_workload
    sam_se_base, _, opt, _ = par_oracle
    mesh, factory_for = dp_parts
    al = DataParallelAligner(idx, opt, mesh=mesh,
                             engine_factory=factory_for(opt))
    assert al.align_batch(se_reads) == sam_se_base


@pytest.mark.slow
def test_dp_mesh_pe(par_workload, par_oracle, dp_parts):
    from bwameme_tpu.parallel.dp import DataParallelAligner

    idx, _, pe_reads = par_workload
    _, sam_pe_base, _, opt_pe = par_oracle
    mesh, factory_for = dp_parts
    al = DataParallelAligner(idx, opt_pe, mesh=mesh,
                             engine_factory=factory_for(opt_pe))
    assert al.align_pairs(pe_reads) == sam_pe_base
