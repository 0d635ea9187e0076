"""Multi-host (multi-process) alignment: the dp axis mapped to PROCESSES.

This makes the protocol sketched in parallel/dp.py real: on a multi-host
pod each host runs one process, holds a full index replica sharded over
its LOCAL devices (idx axis on ICI), and aligns a contiguous slice of
every read chunk. DCN appears only at the edges:

* FASTQ scatter — the launching host splits each chunk into per-process
  FASTQ files (here: the launcher writes ``chunk_{pid}.fq``);
* SAM gather — each process writes its SAM block, the launcher
  concatenates them in process order.

``jax.distributed.initialize`` forms the global runtime (process 0 is
the coordinator); a one-off global-mesh psum proves cross-process
collectives work, then alignment itself uses only the local mesh — reads
are independent, so the dp axis needs no collectives (the reference
scales the same way with threads: kt_for 512-read blocks,
/root/reference/src/kthread.cpp:41-77).

SAM output is byte-identical to a single-process run: per-read ids are
assigned from the global slice offset (mem_mark_primary_se hash seed,
/root/reference/src/bwamem.cpp:2002). Paired-end insert-size statistics
are CHUNK-GLOBAL over DCN: each process collects its local insert
observations (pairing.pestat_isize), allgathers them across processes,
and computes the stats over the union (pairing.pestat_from_isize) —
exactly the reference's whole-chunk mem_pestat
(/root/reference/src/bwamem_pair.cpp:81-149), and the only genuinely
distributed computation in the protocol. A fixed ``-I`` distribution
(the reference's override, /root/reference/src/fastmap.cpp:1346-1360)
remains available via Aligner(pes0=...).

Run standalone:  python -m bwameme_tpu.parallel.multihost [n_procs]
Env-gated test:  BWAMEME_TEST_MULTIHOST=1 pytest tests/test_multihost.py
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

_LOCAL_DEVICES = 4


def _free_port() -> int:
    """Bind-and-release a free TCP port for the coordinator (a fixed port
    collides when two runs execute concurrently, e.g. the env-gated pytest
    next to a dryrun)."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _workload():
    from bwameme_tpu.parallel.dryrun import _build_workload

    return _build_workload(np.random.default_rng(0))


def _gathered_pestat(opt, l_pac, deduped):
    """Chunk-global insert-size stats over DCN: allgather every process's
    local per-orientation observations and compute the stats over the
    union — the distributed mem_pestat (reference:
    src/bwamem_pair.cpp:81-149 runs over the WHOLE chunk before PE
    finalization; a process slice alone would bias the percentiles).
    Observations are concatenated in process order, so the merged lists
    equal the single-process chunk's lists element-for-element."""
    from jax.experimental import multihost_utils

    from bwameme_tpu.align import pairing

    local = pairing.pestat_isize(opt, l_pac, deduped)
    counts = np.array([len(x) for x in local], np.int32)
    all_counts = np.asarray(multihost_utils.process_allgather(counts))
    mx = max(1, int(all_counts.max()))
    pad = np.zeros((4, mx), np.int64)
    for d in range(4):
        pad[d, : counts[d]] = local[d]
    gathered = np.asarray(multihost_utils.process_allgather(pad))
    merged = [
        [int(v) for p in range(gathered.shape[0])
         for v in gathered[p, d, : all_counts[p, d]]]
        for d in range(4)
    ]
    return pairing.pestat_from_isize(merged)


def worker_main(pid: int, n_procs: int, workdir: str, port: int) -> None:
    # NOTE: XLA_FLAGS/JAX_PLATFORMS must be in the env at interpreter
    # start (the container's sitecustomize touches jax first) — the
    # launcher sets them on the Popen env; here we only pin the config.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs
    assert jax.device_count() == n_procs * _LOCAL_DEVICES
    assert len(jax.local_devices()) == _LOCAL_DEVICES

    # prove DCN collectives over the GLOBAL mesh work (psum over all
    # devices of all processes), then align on the LOCAL mesh only
    from jax.sharding import Mesh, PartitionSpec as P

    gmesh = Mesh(np.array(jax.devices()), ("dp",))
    ones = jax.shard_map(
        lambda x: jax.lax.psum(x, "dp"), mesh=gmesh,
        in_specs=P(), out_specs=P())(np.ones(8, np.float32))
    np.testing.assert_allclose(np.asarray(ones)[0], n_procs * _LOCAL_DEVICES)

    from bwameme_tpu.io.fastq import _iter_records
    from bwameme_tpu.pipeline import Aligner
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx, _, _ = _workload()  # index replica (each host loads its own copy)
    mesh = Mesh(np.array(jax.local_devices()), ("idx",))

    opt = MemOptions()
    eng = DeviceSeedingEngine(idx, opt, max_read_len=160, lanes=128,
                              mesh=mesh)

    # SE slice
    reads = list(_iter_records(os.path.join(workdir, f"chunk_se_{pid}.fq")))
    base = int(open(os.path.join(workdir, f"base_se_{pid}")).read())
    al = Aligner(idx, opt, seeding_engine=eng)
    al.n_processed = base  # global read ids for hash-tie ordering
    sam = al.align_batch(reads)
    with open(os.path.join(workdir, f"out_se_{pid}.sam"), "w") as f:
        f.write("".join(sam))

    # PE slice with chunk-GLOBAL insert statistics: kernels run on the
    # local slice, the pestat observations allgather over DCN, then
    # finalization uses the union's stats (== single-process mem_pestat)
    opt_pe = MemOptions()
    opt_pe.flag |= 2
    pairs = list(_iter_records(os.path.join(workdir, f"chunk_pe_{pid}.fq")))
    base_pe = int(open(os.path.join(workdir, f"base_pe_{pid}")).read())
    al_pe = Aligner(idx, opt_pe, seeding_engine=eng)
    al_pe.n_processed = base_pe
    recs_pe = [al_pe._encode(r) for r in pairs]
    deduped = al_pe._pe_kernels(recs_pe)
    pes = _gathered_pestat(opt_pe, idx.bns.l_pac, deduped)
    sam_pe = al_pe._pe_finalize(recs_pe, deduped, pes)
    with open(os.path.join(workdir, f"out_pe_{pid}.sam"), "w") as f:
        f.write("".join(sam_pe))


def run_multihost(n_procs: int = 2, workdir: str | None = None,
                  timeout: float = 1200.0) -> None:
    """Launch n_procs workers, scatter FASTQ, gather SAM, assert equality
    with the single-process host-oracle pipeline."""
    from bwameme_tpu.pipeline import Aligner
    from bwameme_tpu.utils.config import MemOptions

    def write_fastq(path, reads):
        with open(path, "w") as f:
            for r in reads:
                f.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n")

    own_dir = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="bwameme_mh_")
    idx, se_reads, pe_reads = _workload()

    # single-process oracle (host engine); PE infers its insert stats from
    # the whole chunk — the workers must reproduce this exactly via the
    # DCN allgather (no -I crutch)
    opt = MemOptions()
    sam_se_base = Aligner(idx, opt).align_batch(se_reads)
    opt_pe = MemOptions()
    opt_pe.flag |= 2
    sam_pe_base = Aligner(idx, opt_pe).align_pairs(pe_reads)

    # FASTQ scatter: contiguous slices (pair-aligned for PE)
    def scatter(reads, tag, even):
        per = -(-len(reads) // n_procs)
        if even and per % 2:
            per += 1
        b = 0
        for pid in range(n_procs):
            e = min(len(reads), b + per)
            write_fastq(os.path.join(workdir, f"chunk_{tag}_{pid}.fq"),
                        reads[b:e])
            with open(os.path.join(workdir, f"base_{tag}_{pid}"), "w") as f:
                f.write(str(b if tag == "se" else b))
            b = e

    scatter(se_reads, "se", even=False)
    scatter(pe_reads, "pe", even=True)

    procs = []
    port = _free_port()
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={_LOCAL_DEVICES}")
    # CPU workers must not touch the TPU-tunnel plugin at all: with the
    # tunnel down, its sitecustomize hook blocks `import jax` for minutes
    # even under JAX_PLATFORMS=cpu (observed 2026-08-21)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    for pid in range(n_procs):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bwameme_tpu.parallel.multihost",
             "--worker", str(pid), str(n_procs), workdir, str(port)],
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))))
    t0 = time.time()
    try:
        for p in procs:
            rem = max(10.0, timeout - (time.time() - t0))
            rc = p.wait(timeout=rem)
            assert rc == 0, f"worker exited rc={rc}"
    finally:
        # a timeout/assert must not leak the remaining workers
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    # SAM gather in process order == single-process output
    def gather(tag):
        out = []
        for pid in range(n_procs):
            with open(os.path.join(workdir, f"out_{tag}_{pid}.sam")) as f:
                out.extend(ln + "\n" for ln in f.read().splitlines())
        return out

    got_se = [s.rstrip("\n") for s in gather("se")]
    want_se = [s.rstrip("\n") for s in sam_se_base]
    assert got_se == want_se, "multihost SE SAM != single-process SAM"
    got_pe = [s.rstrip("\n") for s in gather("pe")]
    want_pe = [s.rstrip("\n") for s in sam_pe_base]
    assert got_pe == want_pe, "multihost PE SAM != single-process SAM"
    print(f"[multihost] OK: {n_procs} processes x {_LOCAL_DEVICES} devices, "
          f"{len(got_se)} SE + {len(got_pe)} PE records byte-identical "
          f"in {time.time()-t0:.0f}s", file=sys.stderr)
    if own_dir:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker_main(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                    int(sys.argv[5]))
    else:
        run_multihost(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
