"""Data-parallel (dp-axis) alignment over a 2-D dp x idx device mesh.

The distributed design (SURVEY.md §5 "distributed communication backend")
has two axes:

* ``idx`` — the *index* axis: the big per-suffix planes (SA positions,
  key planes, ISA) are sharded by suffix rank; every seeding program runs
  shard_map'ed over the axis with psum-combined gathers
  (parallel/sharded_index.py, ops/sa_search.shard_wrap). One idx group ==
  one coherent replica of the search engine whose HBM footprint is
  1/|idx| of the index.
* ``dp`` — the *data* axis: read batches are sharded across dp rows. Each
  dp row holds a full index replica (sharded over its own idx sub-mesh)
  and aligns its contiguous slice of every chunk. No collectives cross
  the dp axis during alignment: reads are independent, so dp is pure
  replication — exactly how the reference scales with threads
  (kt_for 512-read blocks, src/kthread.cpp:41-77), lifted to devices.

This module drives the dp axis from the host: a chunk of B reads is split
into |dp| contiguous slices; each row's seeding dispatch is enqueued
before any row's results are awaited (JAX dispatch is async, so on real
hardware all rows' device programs execute concurrently — the host only
serializes the cheap enqueues); per-row chaining/extension/finalization
then proceed in row order. SAM output is the in-order concatenation of
the slices and is byte-identical to a single-device run: per-read ids
(the mem_mark_primary_se hash seed, reference src/bwamem.cpp:2002) are
assigned from the global chunk offset, and PE insert-size statistics are
computed over the WHOLE chunk (all rows' regs gathered host-side) before
any row finalizes — matching the reference's chunk-wide mem_pestat
(src/bwamem_pair.cpp:81).

Multi-host story: on a real multi-host pod, the dp axis maps onto hosts
(each host feeds its local devices) with DCN only at the edges — FASTQ
chunks scattered round-robin by the reading host and SAM blocks gathered
in chunk order — while all idx-axis collectives stay on ICI inside each
host's sub-mesh. The chunk/slice protocol here is exactly that scatter/
gather, exercised single-host.
"""

from __future__ import annotations

import numpy as np

from bwameme_tpu.pipeline import Aligner
from bwameme_tpu.utils.config import MemOptions


def make_dp_mesh(n_dp: int, n_idx: int, devices=None):
    """A 2-D dp x idx Mesh over the first n_dp*n_idx devices."""
    import jax
    from jax.sharding import Mesh

    devices = list(jax.devices() if devices is None else devices)
    need = n_dp * n_idx
    if len(devices) < need:
        raise ValueError(f"dp x idx = {n_dp}x{n_idx} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_dp, n_idx)
    return Mesh(grid, ("dp", "idx"))


class DataParallelAligner:
    """Aligner over a 2-D dp x idx mesh: one engine + Aligner per dp row,
    each shard_map'ed over that row's idx sub-mesh; chunks scattered by
    contiguous slices, SAM gathered in order (byte-identical to
    single-device output)."""

    def __init__(self, idx, opt: MemOptions | None = None, mesh=None,
                 engine_factory=None, **aligner_kw) -> None:
        """mesh: a 2-D Mesh with axes ("dp", "idx") (make_dp_mesh).
        engine_factory(row_mesh) -> seeding engine for one dp row, where
        row_mesh is that row's 1-D idx Mesh (or None when |idx| == 1)."""
        from jax.sharding import Mesh

        if mesh is None or mesh.axis_names != ("dp", "idx"):
            raise ValueError('DataParallelAligner needs a mesh with axes '
                             '("dp", "idx") — see make_dp_mesh')
        self.opt = opt or MemOptions()
        if engine_factory is None:
            from bwameme_tpu.seeding.engine import DeviceSeedingEngine

            def engine_factory(row_mesh):
                return DeviceSeedingEngine(idx, self.opt, mesh=row_mesh)

        grid = mesh.devices
        self.mesh = mesh
        self.rows: list[Aligner] = []
        for r in range(grid.shape[0]):
            row_mesh = (Mesh(grid[r], ("idx",))
                        if grid.shape[1] > 1 else None)
            eng = engine_factory(row_mesh)
            self.rows.append(Aligner(idx, self.opt, seeding_engine=eng,
                                     **aligner_kw))
        self.n_dp = len(self.rows)
        self.n_processed = 0

    def _slices(self, n: int, even: bool = False) -> list[tuple[int, int]]:
        """Contiguous balanced slices of [0, n) across dp rows; `even`
        keeps boundaries on pair boundaries (PE interleaved input)."""
        per = -(-n // self.n_dp)
        if even and per % 2:
            per += 1
        out = []
        b = 0
        for _ in range(self.n_dp):
            e = min(n, b + per)
            out.append((b, e))
            b = e
        return out

    def align_batch(self, reads) -> list[str]:
        """Single-end chunk: seed dispatches for ALL rows are enqueued
        up-front (async; concurrent across rows on real hardware), then
        each row chains/extends/finalizes its slice in order."""
        sl = self._slices(len(reads))
        pend = []
        for (b, e), row in zip(sl, self.rows):
            recs = [row._encode(r) for r in reads[b:e]]
            tok = row._submit_seed(recs) if recs else None
            pend.append((row, b, recs, tok))
        out: list[str] = []
        chunk_base = self.n_processed
        for row, b, recs, tok in pend:
            if not recs:
                continue
            smems = None
            if tok is not None:
                smems = row.engine.finish_batch_flat(tok)
                if smems is None:
                    lst = row.engine.finish_batch(tok)
                    smems = [sorted(sm, key=lambda s: (s.start, s.end))
                             for sm in lst]
            if smems is None:
                smems = row.collect_smems(recs)
            k2 = row._kernel2_submit(recs, smems)
            regs_per_read = row._kernel2_finish(k2)
            row.n_processed = chunk_base + b  # global ids for hash ties
            out.extend(row._finalize_se(recs, regs_per_read))
        self.n_processed = chunk_base + len(reads)
        return out

    def align_stream(self, batches):
        """Streamed SE alignment: each incoming batch is scattered across
        the dp rows (align_batch already overlaps all rows' seeding
        dispatches); yields one SAM block list per batch, in order."""
        for reads in batches:
            yield self.align_batch(reads)

    def align_pairs(self, reads) -> list[str]:
        """Paired-end chunk: per-row kernels over pair-aligned slices,
        chunk-GLOBAL insert statistics (all rows' regs gathered), then
        per-row rescue + finalization with global pair ids."""
        from bwameme_tpu.align import pairing

        assert len(reads) % 2 == 0
        sl = self._slices(len(reads), even=True)
        parts = []
        for (b, e), row in zip(sl, self.rows):
            recs = [row._encode(r) for r in reads[b:e]]
            deduped = row._pe_kernels(recs) if recs else []
            parts.append((row, b, recs, deduped))
        all_regs = [regs for _, _, _, dd in parts for regs in dd]
        pes = (self.rows[0].pes0 if self.rows[0].pes0 is not None
               else pairing.pestat(self.opt, self.rows[0].idx.bns.l_pac,
                                   all_regs))
        out: list[str] = []
        chunk_base = self.n_processed
        for row, b, recs, deduped in parts:
            if not recs:
                continue
            row.n_processed = chunk_base + b  # global pair ids
            out.extend(row._pe_finalize(recs, deduped, pes))
        self.n_processed = chunk_base + len(reads)
        return out
