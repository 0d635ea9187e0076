"""End-to-end single-end alignment pipeline (mem driver).

The analog of mem_process_seqs (reference: src/bwamem.cpp:1920-1971) for
single-end reads:

  kernel 1: seeding (SMEMs) + chaining + chain filters   [worker_bwt]
  kernel 2: batched banded-SW extension + dedup/patch    [worker_aln]
  kernel 3: primary marking + mapq + CIGAR + SAM         [worker_sam]

Seeding/extension run batched on device (JAX); chaining and finalization are
host-side (small per-read work), mirroring where the reference spends its
cycles (SURVEY.md §3.1 hot loops).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from bwameme_tpu.align import chain as chain_mod
from bwameme_tpu.align import extend as extend_mod
from bwameme_tpu.align import finalize
from bwameme_tpu.index.build import MemeIndex
from bwameme_tpu.index.packing import NT4_TABLE
from bwameme_tpu.io.fastq import Read
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils import fallbacks
from bwameme_tpu.utils.config import MEM_F_ALL, MEM_F_PRIMARY5, MemOptions
from bwameme_tpu.utils.timer import tstage


@dataclasses.dataclass
class ReadRec:
    name: str
    codes: np.ndarray
    qual: str | None
    comment: str | None


# shape-padding sentinel for tail batches (identity-compared)
_PAD_REC = ReadRec("*pad*", np.zeros(0, np.uint8), None, None)


class Aligner:
    def __init__(self, idx: MemeIndex, opt: MemOptions | None = None,
                 seeding_engine=None, rg_id: str | None = None,
                 batched_rescue: bool | None = None, pes0=None,
                 copy_comment: bool = False) -> None:
        self.idx = idx
        self.opt = opt or MemOptions()
        self.engine = seeding_engine or HostSeedingEngine(idx, self.opt)
        self.rg_id = rg_id
        self.n_processed = 0
        # -I: fixed insert-size distribution instead of per-chunk inference
        # (reference: src/fastmap.cpp:1346-1360, src/bwamem.cpp:1951-1953)
        self.pes0 = pes0
        self.copy_comment = copy_comment
        # PE mate rescue: one batched kswv-analog dispatch per chunk when a
        # device engine drives seeding (the reference's mem_sam_pe_batch
        # path); the serial per-pair path otherwise (mem_matesw)
        if batched_rescue is None:
            batched_rescue = seeding_engine is not None and hasattr(
                seeding_engine, "collect_smems_batch")
        self.batched_rescue = batched_rescue
        # coordinate-based fused extension (one dispatch for both sides and
        # both band tries) when the seeding engine holds a device index with
        # the packed text resident in HBM
        self.fused_extension = (
            getattr(getattr(seeding_engine, "di", None), "text32", None)
            is not None)

    def _extend_batch(self, queries, chains_per_read):
        if self.fused_extension:
            try:
                return extend_mod.extend_chains_batch_fused(
                    self.opt, self.idx.bns, self.idx.text, queries,
                    chains_per_read, self.engine.di.text32)
            except fallbacks.EXPECTED as e:
                fallbacks.note("extension.fused", e)
                self.fused_extension = False
        return extend_mod.extend_chains_batch(
            self.opt, self.idx.bns, self.idx.text, queries, chains_per_read)

    def _kernel2_submit(self, recs, smems_per_read):
        """Chaining + extension dispatch for a seeded batch; returns an
        opaque token for _kernel2_finish. Three tiers:
        1. flat-native: C++ chaining -> C++ reg/job build -> one device
           dispatch, no per-seed Python (short reads, native lib, device
           index);
        2. fused: dataclass chains + the coordinate device program;
        3. buffer: dataclass chains + the byte-shipping kernel rounds."""
        queries = [r.codes for r in recs]
        if self.fused_extension and extend_mod.rescore_is_noop(self.opt,
                                                               queries):
            try:
                with tstage("chain"):
                    raw = chain_mod.chain_and_filter_raw(
                        self.opt, self.idx.bns, queries, smems_per_read,
                        getattr(self.engine, "sa_positions", self.idx.sa))
                if raw is not None:
                    tok = extend_mod.extend_flat_submit(
                        self.opt, self.idx.bns, queries, raw,
                        self.engine.di.text32)
                    if tok is not None:
                        return ("flat", tok)
            except fallbacks.EXPECTED as e:
                fallbacks.note("extension.flat_native", e)
        queries, chains_per_read = self._chain_batch(recs, smems_per_read)
        if self.fused_extension:
            try:
                return ("fused", extend_mod.fused_extend_submit(
                    self.opt, self.idx.bns, self.idx.text, queries,
                    chains_per_read, self.engine.di.text32))
            except fallbacks.EXPECTED as e:
                fallbacks.note("extension.fused_submit", e)
                self.fused_extension = False
        return ("buffer", (queries, chains_per_read))

    def _kernel2_finish(self, token):
        kind, tok = token
        if kind == "flat":
            return extend_mod.extend_flat_finish(tok)
        if kind == "fused":
            return extend_mod.fused_extend_finish(tok)
        queries, chains_per_read = tok
        return extend_mod.extend_chains_batch(
            self.opt, self.idx.bns, self.idx.text, queries, chains_per_read)

    def _encode(self, read: Read) -> ReadRec:
        codes = NT4_TABLE[np.frombuffer(read.seq.encode(), dtype=np.uint8)]
        comment = read.comment if self.copy_comment else None
        return ReadRec(read.name, codes, read.qual, comment)

    def collect_smems(self, recs: list[ReadRec]):
        """Kernel-1 seeding for a batch; uses the engine's batched interface
        when available (DeviceSeedingEngine). Prefers the flat compacted
        result (a FlatSmems struct) — chaining consumes it without building
        per-read Smem lists."""
        with tstage("seed.collect"):
            if hasattr(self.engine, "sorted_smems_batch_flat"):
                flat = self.engine.sorted_smems_batch_flat(
                    [r.codes for r in recs])
                if flat is not None:
                    return flat
            if hasattr(self.engine, "sorted_smems_batch"):
                return self.engine.sorted_smems_batch(
                    [r.codes for r in recs])
            return [self.engine.sorted_smems(r.codes) for r in recs]

    def _chain_batch(self, recs, smems_per_read):
        """Kernel-1 tail: chaining + chain filters for a seeded batch."""
        opt, idx = self.opt, self.idx
        queries = [r.codes for r in recs]
        with tstage("chain"):
            chains_per_read = chain_mod.chain_and_filter_batch(
                opt, idx.bns, queries, smems_per_read,
                getattr(self.engine, "sa_positions", idx.sa))
            for rec, chains in zip(recs, chains_per_read):
                chain_mod.filter_chained_seeds(opt, idx.bns, idx.text,
                                               rec.codes, len(rec.codes),
                                               chains)
        return queries, chains_per_read

    def _finalize_se(self, recs, regs_per_read) -> list[str]:
        """Kernel 3 for single-end reads: dedup, primary marking, SAM."""
        with tstage("finalize"):
            return self._finalize_se_inner(recs, regs_per_read)

    def _finalize_se_inner(self, recs, regs_per_read) -> list[str]:
        while recs and recs[-1] is _PAD_REC:  # drop shape-padding reads
            recs = recs[: len(recs) - 1]
            regs_per_read = regs_per_read[: len(recs)]
        if getattr(self, "_use_native_finalize", True):
            # the whole kernel-3 loop in C++ (native.finalize_se_c;
            # byte-identical to the Python contract below, differentially
            # tested in tests/test_native_finalize.py) — the Python loop
            # remains the documented reference implementation
            from bwameme_tpu.align import native

            out = native.finalize_se_native(
                self.opt, self.idx.bns, self.idx.text, recs, regs_per_read,
                self.rg_id, self.n_processed)
            if out is not None:
                self.n_processed += len(recs)
                return out
            self._use_native_finalize = False
        opt, idx = self.opt, self.idx
        bns, text = idx.bns, idx.text
        out = []
        for li, (rec, regs) in enumerate(zip(recs, regs_per_read)):
            regs = [r for r in regs if r.qe > r.qb]
            regs = finalize.sort_dedup_patch(opt, bns, text, rec.codes, regs)
            for r in regs:
                if r.rid >= 0 and getattr(bns.contigs[r.rid], "is_alt",
                                          False):
                    r.is_alt = True
            regs = finalize.mark_primary(opt, regs, self.n_processed + li)
            if opt.flag & MEM_F_PRIMARY5:
                finalize.reorder_primary5(opt.T, regs)
            XA = None
            if not (opt.flag & MEM_F_ALL):
                from bwameme_tpu.align.alt import gen_alt

                XA = gen_alt(opt, bns, text, regs, len(rec.codes), rec.codes)
            sam = finalize.reg2sam(opt, bns, text, rec, rec.codes, regs,
                                   rg_id=self.rg_id, XA=XA)
            out.append(sam)
        self.n_processed += len(recs)
        return out

    def align_batch(self, reads: list[Read]) -> list[str]:
        """Align a batch of single-end reads; returns SAM line blocks
        (one string per read, possibly multi-line)."""
        recs = [self._encode(r) for r in reads]
        smems_per_read = self.collect_smems(recs)
        return self._align_from_smems(recs, smems_per_read)

    def align_stream(self, batches):
        """Pipelined single-end alignment over an iterable of read batches —
        the analog of the reference's 3-stage ktp pipeline (src/fastmap.cpp:
        730-907), scheduled for a single device executing dispatches FIFO:

          seed(k) · extend(k) · seed(k+1) · extend(k+1) · ...

        For batch k the host waits on seed(k), chains (native, ~ms), then
        enqueues extend(k) *before* seed(k+1) so extension is never stuck
        behind the next batch's seeding; host finalization of batch k then
        overlaps seed(k+1) on the device. Yields SAM blocks per batch, in
        order."""
        engine = self.engine
        pending = None
        B0 = None
        for reads in batches:
            recs = [self._encode(r) for r in reads]
            if B0 is None:
                B0 = len(recs)
            recs = self._pad_batch(recs, B0)
            if pending is None:
                pending = (recs, self._submit_seed(recs))
                continue
            sam, next_token = self._finish_stream(pending, next_recs=recs)
            yield sam
            pending = (recs, next_token)
        if pending is not None:
            sam, _ = self._finish_stream(pending, next_recs=None)
            yield sam

    @staticmethod
    def _pad_batch(recs, B):
        """Pad a short (tail) batch with empty reads to the stream's batch
        size: a fresh lane-count shape would recompile every device program
        for a single chunk tail. Padding reads have length 0 (no seeds, no
        chains) and their SAM output is dropped by the n_real trim."""
        if len(recs) >= B or not recs:
            return recs
        return recs + [_PAD_REC] * (B - len(recs))

    def _submit_seed(self, recs):
        if not hasattr(self.engine, "submit_batch"):
            return None
        try:
            with tstage("seed.submit"):
                return self.engine.submit_batch([r.codes for r in recs])
        except fallbacks.EXPECTED as e:
            fallbacks.note("seeding.submit", e)
            self.engine.use_fused = False
            return None

    def _finish_stream(self, item, next_recs=None):
        """Process one pipelined batch; returns (sam_blocks, token for
        next_recs' seeding, submitted between this batch's extension
        dispatch and its host finalization)."""
        recs, token = item
        smems = None
        if token is not None:
            try:
                with tstage("seed.finish"):
                    smems = self.engine.finish_batch_flat(token)
                    if smems is None:
                        lst = self.engine.finish_batch(token)
                        smems = [sorted(sm, key=lambda s: (s.start, s.end))
                                 for sm in lst]
            except fallbacks.EXPECTED as e:
                fallbacks.note("seeding.finish", e)
                self.engine.use_fused = False
                smems = None
        if smems is None:
            smems = self.collect_smems(recs)
        with tstage("extend.submit"):
            k2 = self._kernel2_submit(recs, smems)
        next_token = self._submit_seed(next_recs) if next_recs else None
        with tstage("extend.finish"):
            regs_per_read = self._kernel2_finish(k2)
        return self._finalize_se(recs, regs_per_read), next_token

    def _align_from_smems(self, recs: list[ReadRec],
                          smems_per_read) -> list[str]:
        """Kernels 2-3 for an already-seeded batch."""
        regs_per_read = self._kernel2_finish(
            self._kernel2_submit(recs, smems_per_read))
        return self._finalize_se(recs, regs_per_read)

    def align_pairs(self, reads: list[Read]) -> list[str]:
        """Align interleaved paired-end reads (R1,R2,R1,R2,...); returns SAM
        line blocks per read. Mirrors the PE flow of mem_process_seqs
        (reference: src/bwamem.cpp:1920-1971 + worker_sam PE branch)."""
        from bwameme_tpu.align import pairing

        assert len(reads) % 2 == 0
        recs = [self._encode(r) for r in reads]
        deduped = self._pe_kernels(recs)
        # insert-size statistics over the whole chunk (or the -I override)
        with tstage("pe.pestat"):
            pes = (self.pes0 if self.pes0 is not None
                   else pairing.pestat(self.opt, self.idx.bns.l_pac, deduped))
        return self._pe_finalize(recs, deduped, pes)

    def _pe_kernels(self, recs: list[ReadRec]) -> list[list]:
        """PE kernels 1-2 (+ whole-batch dedup) for an interleaved chunk;
        returns deduped alnregs per read. Split out so a data-parallel
        driver (parallel/dp.py) can run this per dp shard and compute the
        chunk-wide insert statistics globally before _pe_finalize."""
        opt = self.opt
        idx = self.idx
        bns = idx.bns
        text = idx.text

        # kernels 1-2 in device-sized batches, pipelined like align_stream
        # (seed(k+1) enqueued between extend(k)'s dispatch and its host
        # finalization); pairing statistics stay chunk-wide below
        bsz = getattr(self.engine, "lanes", None) or len(recs) or 1
        parts = [self._pad_batch(recs[b0: b0 + bsz], bsz)
                 for b0 in range(0, len(recs), bsz)]
        deduped = []
        seed_tok = self._submit_seed(parts[0]) if parts else None
        for pi, part in enumerate(parts):
            smems = None
            if seed_tok is not None:
                try:
                    smems = self.engine.finish_batch_flat(seed_tok)
                    if smems is None:
                        lst = self.engine.finish_batch(seed_tok)
                        smems = [sorted(sm, key=lambda s: (s.start, s.end))
                                 for sm in lst]
                except fallbacks.EXPECTED as e:
                    fallbacks.note("seeding.finish_pe", e)
                    self.engine.use_fused = False
                    smems = None
            if smems is None:
                smems = self.collect_smems(part)
            k2 = self._kernel2_submit(part, smems)
            seed_tok = (self._submit_seed(parts[pi + 1])
                        if pi + 1 < len(parts) else None)
            regs_per_read = self._kernel2_finish(k2)
            real = [(rec, regs) for rec, regs in zip(part, regs_per_read)
                    if rec is not _PAD_REC]
            dd = None
            if real and getattr(self, "_use_native_finalize", True):
                # whole-batch mem_sort_dedup_patch in C++ (the SE path gets
                # dedup inside finalize_se_c; PE needs the regs back for
                # pestat + batched rescue) — byte-identical contract below
                from bwameme_tpu.align import native

                dd = native.dedup_batch_native(
                    opt, bns, text, [t[0] for t in real],
                    [t[1] for t in real])
            if dd is None:
                dd = [finalize.sort_dedup_patch(
                          opt, bns, text, rec.codes,
                          [r for r in regs if r.qe > r.qb])
                      for rec, regs in real]
            for regs in dd:
                for r in regs:
                    if r.rid >= 0 and getattr(bns.contigs[r.rid], "is_alt",
                                              False):
                        r.is_alt = True
                deduped.append(regs)
        return deduped

    def _pe_finalize(self, recs: list[ReadRec], deduped, pes) -> list[str]:
        """PE rescue + pairing + SAM emission for an interleaved chunk whose
        kernels already ran (_pe_kernels) and whose insert statistics are
        given (chunk-wide, or dp-global under parallel/dp.py)."""
        from bwameme_tpu.align import pairing

        opt = self.opt
        idx = self.idx
        bns = idx.bns
        text = idx.text
        if self.batched_rescue:
            with tstage("pe.rescue"):
                recs_pairs = [(recs[i], recs[i + 1])
                              for i in range(0, len(recs), 2)]
                regs_pairs = [[deduped[i], deduped[i + 1]]
                              for i in range(0, len(recs), 2)]
                pairing.sam_pe_batch_rescue(opt, bns, text, pes, recs_pairs,
                                            regs_pairs)
        out = None
        with tstage("pe.finalize"):
            if self.batched_rescue and getattr(self, "_use_native_finalize",
                                               True):
                # mem_pair + mem_sam_pe for the whole chunk in ONE C++ call
                # (native.finalize_pe_c; byte-identical to the Python
                # contract below — tests/test_native_finalize.py)
                from bwameme_tpu.align import native

                out = native.finalize_pe_native(
                    opt, bns, text, pes, self.n_processed >> 1, recs,
                    deduped, self.rg_id)
                if out is None:
                    self._use_native_finalize = False
            if out is None:
                out = []
                for i in range(0, len(recs), 2):
                    pair_id = (self.n_processed >> 1) + (i >> 1)
                    s0, s1 = pairing.sam_pe(
                        opt, bns, text, pes, pair_id,
                        [recs[i], recs[i + 1]],
                        [deduped[i], deduped[i + 1]],
                        rg_id=self.rg_id, skip_rescue=self.batched_rescue,
                    )
                    out.extend([s0, s1])
        self.n_processed += len(recs)
        return out
