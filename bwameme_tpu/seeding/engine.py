"""Batched device (JAX/TPU) seeding engine.

Runs the 3-round learned-index SMEM algorithm (see host_engine.py for the
scalar contract) as a host-side state machine issuing *batched* device
queries: each round makes exactly one jitted `sa_query` (or `third_round`)
call covering every active read in the batch — left extensions ride the same
call as right extensions via the reverse-complement half of the packed query
buffer. The per-read control flow (pivot advance, N skips, emission rules)
costs nanoseconds on the host; all memory-bound search work (P-RMI predict,
error-bounded binary search, suffix compares) runs on the TPU.

Produces bit-identical SMEM sets to HostSeedingEngine (differentially
tested), which itself replicates the reference
(src/LearnedIndex_seeding.cpp:913-1283).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from bwameme_tpu.index.packing import pack_words
from bwameme_tpu.utils import fallbacks
from bwameme_tpu.ops.sa_search import DeviceIndex, make_search_fns
from bwameme_tpu.seeding.host_engine import (FlatSmems, HostSeedingEngine,
                                             Smem)

# state-machine phases
DONE = 0
RIGHT0 = 1   # right search at an outer pivot (emits)
LEFT = 2     # left extension in the zigzag (no emit)
RIGHT_Z = 3  # right search in the zigzag (emits)


class DeviceSeedingEngine:
    def __init__(self, idx, opt, max_read_len: int = 160,
                 lanes: int = 1024, root: str = "prmi",
                 ert_bits: int = 0, mesh=None,
                 index_axis: str = "idx", mode: int | None = None,
                 wide: bool | None = None) -> None:
        """root="prmi" (learned index, the -7 path) or "kmer" (the ERT
        backend: direct k-mer-root window, see index/ert.py).

        mesh: a jax.sharding.Mesh scales the engine out — the big
        per-suffix planes are sharded along `index_axis` (key-range
        sharding) and every device program runs shard_map'ed with
        psum-combined gathers; queries are replicated over the mesh and
        results are identical to the single-device engine (SURVEY.md §5
        distributed backend).

        wide: int64 device ranks/positions (auto for n_sa >= 2^31, e.g.
        the human genome; needs jax_enable_x64 — see
        DeviceIndex.from_host). SMEM interval fields (lb, hitcount) ride
        int64 slot planes; read coordinates stay int32."""
        self.idx = idx
        self.opt = opt
        self.root = root
        self.mesh = mesh
        self.index_axis = index_axis
        if root == "kmer":
            # window bound for the fixed-round search, computed host-side
            # (reading it back off the device table costs a big transfer)
            from bwameme_tpu.index.ert import build_kmer_table, pick_ert_bits

            kb = ert_bits if ert_bits > 0 else pick_ert_bits(idx.n_sa)
            tab = build_kmer_table(idx.key_hi, kb)
            self._kmer_max_width = (int(np.max(tab[1:] - tab[:-1]))
                                    if len(tab) > 1 else 1)
        self.di = DeviceIndex.from_host(
            idx, ert_bits=(ert_bits if root == "kmer" else None),
            mesh=mesh, shard_axis=index_axis, mode=mode, wide=wide)
        # interval dtype: SMEM (lb, hitcount) slot planes and transfers
        self.idt = jnp.int64 if self.di.wide else jnp.int32
        # fixed lane count -> exactly one compilation per query kernel
        # (shrinking active sets run with inert lanes; gathers are cheap)
        self.lanes = lanes
        self._prep_dev = self._build_prepare_device()
        # straggler compaction: full-width iterations before the unfinished
        # lanes are compacted to R//4 width (see _build_fused_step1)
        import os as _os2

        self.step1_cap1 = int(_os2.environ.get("BWAMEME_STEP1_CAP1", "30"))
        # 32 measured best on-chip (100 Mbp sweep 2026-08-20: 16 -> 8561,
        # 32 -> 10013, 48 -> 9490, 64 -> 9225 reads/s): step 2's
        # full-width safety net was eating the gain of compaction when
        # begin stopped after only 16 transitions
        self.step2_cap1 = int(_os2.environ.get("BWAMEME_STEP2_CAP1", "32"))
        # state-machine transitions per while-loop iteration (identical
        # results; DONE lanes are inert). Measured on this chip: K=4 is
        # ~12% SLOWER than K=1 (cost tracks body op count, not iteration
        # count) — kept as a knob for chips where the balance differs
        self.body_unroll = int(_os2.environ.get("BWAMEME_BODY_UNROLL", "1"))
        # straggler-compaction width divisor: continue_at narrows the
        # unfinished lanes to R/frac before the full-width safety net
        self.compact_frac = int(_os2.environ.get("BWAMEME_COMPACT_FRAC",
                                                 "4"))
        self.max_smems = 96  # per-read emission capacity in the fused kernels
        self.use_fused = True
        # steps 2 and 3 as single fused dispatches (depth-2 programs,
        # ~2 min one-time TPU compile each, persistent-cached); the
        # host-driven waves remain as the fallback path. Env knob so the
        # (CPU-compiled) test suite can skip the two big compiles per
        # engine instance; a dedicated parity test covers the fused path.
        import os as _os

        _f23 = _os.environ.get("BWAMEME_FUSE_STEPS23", "1") == "1"
        self.fuse_step3 = _f23
        self.fuse_step2 = _f23
        # sort-free device compaction + host-side (start, end) ordering;
        # see _build_pack (device lexsort is a degraded-state suspect)
        self.pack_nosort = _os.environ.get("BWAMEME_PACK_NOSORT",
                                           "0") == "1"
        self._pack = self._build_pack()
        # per-read average emission capacity of the packed (compacted)
        # result transfer; overflow falls back to the full slot transfer
        self.pack_cap_per_read = 24
        # Read-length tiers: search fns + fused programs are compiled per
        # length bucket (compare-unroll depth = ceil(bucket/32) 32-base
        # segments, each ~2 HBM gather rounds — short reads must not pay a
        # long bucket's probes). The ceiling matches the reference's
        # LEARNED_MAX_READ_LEN=500 learned-path cap (src/macro.h:54,
        # hard exit at src/bwamem.cpp:1259-1262).
        self.len_buckets = (160, 224, 320, 512)
        self._tiers: dict[int, tuple] = {}
        self._activate_tier(max_read_len)

    # -------------------------------------------------- read-length tiers
    def _activate_tier(self, read_len: int) -> None:
        """Select (building if first use) the compile tier for reads up to
        `read_len` bases. Tiers share the device-resident index; only the
        jitted programs differ (suffix-compare unroll depth)."""
        for b in self.len_buckets:
            if read_len <= b:
                bucket = b
                break
        else:
            raise ValueError(
                f"read length {read_len} exceeds the learned seeding path's "
                f"{self.len_buckets[-1]} bp ceiling (the reference hard-caps "
                "at LEARNED_MAX_READ_LEN=500, src/macro.h:54)")
        # the packed SMEM transfer encodes end coordinates in 10 bits
        assert bucket <= 1023, "packed transfer requires max_read_len <= 1023"
        tier = self._tiers.get(bucket)
        if tier is None:
            # window bound from the HOST index (a device->host params read
            # is hundreds of MB at human-scale leaf counts)
            if self.root == "kmer":
                mw = None  # ert root: table widths live on the device plane
                if getattr(self, "_kmer_max_width", None) is not None:
                    mw = self._kmer_max_width
            else:
                mw = int(max(np.max(
                    np.asarray(self.idx.rmi_err_lo, np.int64)
                    + np.asarray(self.idx.rmi_err_hi, np.int64)), 1))
            import os as _os3

            # AOT-cache key for every program this tier builds: max_width
            # sets the lb_rounds unroll; the env knobs change the traced
            # body (see aot_cache.aot_jit key_extra)
            self._trace_key = (
                self.root, mw, self.di.n_sa, bucket,
                _os3.environ.get("BWAMEME_EAGER_DEEP", "0"),
                _os3.environ.get("BWAMEME_WINDOW_PROBE", "0"),
                _os3.environ.get("BWAMEME_WINDOW_CAP", "34"))
            self.fns = make_search_fns(
                self.di, max_read_words=-(-bucket // 16), root=self.root,
                mesh=self.mesh, shard_axis=self.index_axis, max_width=mw)
            tier = (self.fns, self._build_third_round(),
                    self._build_fused_step1(), self._build_fused_step2b(),
                    self._build_fused_step3())
            self._tiers[bucket] = tier
        (self.fns, self._tr, self._fused_step1, self._fused_step2,
         self._fused_step3) = tier
        self.max_read_len = bucket

    def _select_tier(self, batch_maxlen: int) -> None:
        """Best-fit tier for a batch: short batches must not pay a long
        bucket's probe depth, so this downshifts as well as upshifts
        (tiers are cached after their first build)."""
        for b in self.len_buckets:
            if batch_maxlen <= b:
                if b != self.max_read_len:
                    self._activate_tier(batch_maxlen)
                return
        self._activate_tier(batch_maxlen)  # raises the clean ceiling error

    def _jit(self, fn, static_argnames=()):
        """jit a device program whose FIRST argument is the DeviceIndex.
        Single-device: jit behind the AOT executable cache (warm starts
        skip MINUTES of tracing of the big fused programs — see
        utils/aot_cache.py). Mesh: jit(shard_map(...)) — index planes
        per-shard, all other args replicated, outputs replicated —
        memoized per (n_args, static kwargs) so program caching matches
        plain jit's static_argnames behavior."""
        if self.mesh is None:
            from bwameme_tpu.utils.aot_cache import aot_jit

            # trace-time parameters baked into the program but invisible in
            # arg shapes (lb_rounds unroll from the index's error window,
            # trace-time env knobs) ride the cache key — a retrained index
            # with identical shapes must not reuse a stale executable
            return aot_jit(fn, name=getattr(fn, "__name__", "prog"),
                           static_argnames=static_argnames,
                           key_extra=getattr(self, "_trace_key", None))
        from bwameme_tpu.ops.sa_search import shard_wrap

        cache = {}

        def call(di, *args, **kw):
            key = (len(args), tuple(sorted(kw.items())))
            f = cache.get(key)
            if f is None:
                f = shard_wrap(
                    lambda d, *a, _kw=dict(kw): fn(d, *a, **_kw), di=di,
                    mesh=self.mesh, shard_axis=self.index_axis,
                    n_args=len(args))
                cache[key] = f
            return f(di, *args)

        return call

    # ---------------------------------------------------------------- pack
    def _build_pack(self):
        """Device-side compaction of the (up to) three rounds' emission
        slots: the fused steps return mostly-empty (4, R, M+1) slot arrays
        whose full transfer dominates seeding wall time on a thin
        host<->device link; this 4th dispatch sorts all valid emissions by
        (read, start, end) -- the mem_smem_sort_lt order chaining consumes
        -- and emits one dense (3, cap) int32 buffer: start<<10|end,
        sa_lo, hitcount."""

        def pack(pairs_flat, cap):
            # pairs_flat: tuple (slots_a, ns_a, slots_b, ns_b, ...); each
            # slots is a (starts, ends, lbs, cnts) tuple — lbs/cnts ride
            # the engine's interval dtype (int64 on wide indexes)
            sts, ens, lbs, cns, vals = [], [], [], [], []
            R = None
            for i in range(0, len(pairs_flat), 2):
                slots, ns = pairs_flat[i], pairs_flat[i + 1]
                R, M1 = slots[0].shape
                ks = jnp.arange(M1, dtype=jnp.int32)
                sts.append(slots[0])
                ens.append(slots[1])
                lbs.append(slots[2])
                cns.append(slots[3])
                vals.append(ks[None, :] < ns[:, None])
            st = jnp.concatenate(sts, axis=1)
            en = jnp.concatenate(ens, axis=1)
            lb = jnp.concatenate(lbs, axis=1)
            cn = jnp.concatenate(cns, axis=1)
            valid = jnp.concatenate(vals, axis=1)
            Mt = st.shape[1]
            if self.pack_nosort:
                # SORT-FREE compaction: cumsum positions + scatter in
                # source (read-major) order; the (start, end) ordering the
                # chainer needs is restored host-side in finish_batch_flat
                # (one np.lexsort over the dense entries). Device sort is
                # skipped entirely — the device-side lexsort program is a
                # suspect for the tunnel's degraded-gather trigger.
                vflat = valid.reshape(-1)
                pos = jnp.cumsum(vflat.astype(jnp.int32)) - 1
                tgt = jnp.where(vflat, pos, cap)  # cap = OOB -> dropped
                stp = jnp.zeros(cap, jnp.int32).at[tgt].set(
                    st.reshape(-1), mode="drop")
                enp = jnp.zeros(cap, jnp.int32).at[tgt].set(
                    en.reshape(-1), mode="drop")
                sten = (stp << 10) | jnp.minimum(enp, 1023)
                lbp = jnp.zeros(cap, lb.dtype).at[tgt].set(
                    lb.reshape(-1), mode="drop")
                cnp = jnp.zeros(cap, cn.dtype).at[tgt].set(
                    cn.reshape(-1), mode="drop")
                counts = valid.sum(axis=1, dtype=jnp.int32)
                if lbp.dtype == jnp.int32:
                    return jnp.concatenate([counts, sten, lbp, cnp])
                return jnp.stack([sten.astype(lbp.dtype), lbp, cnp]), counts
            read = jax.lax.broadcasted_iota(jnp.int32, (R, Mt), 0)
            read = jnp.where(valid, read, R)  # invalid rows sort last
            # stable 3-key lexsort == python sorted(key=(start, end)) with
            # source order preserved on ties
            order = jnp.lexsort(
                (en.reshape(-1), st.reshape(-1), read.reshape(-1)))
            sel = order[:cap]
            stp = jnp.take(st.reshape(-1), sel)
            enp = jnp.take(en.reshape(-1), sel)
            sten = (stp << 10) | jnp.minimum(enp, 1023)
            lbp = jnp.take(lb.reshape(-1), sel)
            cnp = jnp.take(cn.reshape(-1), sel)
            counts = valid.sum(axis=1, dtype=jnp.int32)
            if lbp.dtype == jnp.int32:
                # ONE flat int32 buffer = ONE device->host fetch per batch:
                # the tunnel charges a fixed ~85 ms latency per fetch
                # (measured 2026-08-20), which dominated the transfer
                return jnp.concatenate([counts, sten, lbp, cnp])
            packed = jnp.stack([sten.astype(lbp.dtype), lbp, cnp])
            return packed, counts

        from bwameme_tpu.utils.aot_cache import aot_jit

        jitted = aot_jit(pack, name="pack", static_argnames=("cap",),
                         key_extra=("nosort", self.pack_nosort))

        def run(pairs, cap):
            flat = []
            for slots, ns in pairs:
                flat.extend((slots, ns))
            return jitted(tuple(flat), cap=cap)

        return run

    # ---------------------------------------------------- device-side prep
    def _build_prepare_device(self):
        """Batch preparation as a device program: the host ships ONLY the
        (R, L) uint8 code matrix + lengths; strand packing, the 2-bit query
        buffer, and the next-N / next-valid tables are computed on device.
        Over a thin host<->device link the table upload would cost more than
        the compute (reference analog: the read encoding loop in
        mem_kernel1_core, src/bwamem.cpp:1264-1344)."""

        def prep(mat, lens):
            R, L = mat.shape
            W = (L + 15) // 16 + 3
            cols = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
            lensc = lens[:, None]
            valid = cols < lensc
            m = jnp.where(valid, mat.astype(jnp.int32), 3)
            # RC rows: reverse within each row's own length
            ridx = jnp.clip(lensc - 1 - cols, 0, L - 1)
            rj = jnp.take_along_axis(m, ridx, axis=1)
            rc = jnp.where((rj < 4) & valid, 3 - rj, jnp.where(valid, rj, 3))
            # 2-bit pack both strands (N packs as 0; masked via the tables)
            both = jnp.concatenate([m, rc])                  # (2R, L)
            safe = jnp.where(both >= 4, 0, both).astype(jnp.uint32)
            pad = (-L) % 16
            if pad:
                safe = jnp.concatenate(
                    [safe, jnp.full((2 * R, pad), 3, jnp.uint32)], axis=1)
            w16 = safe.reshape(2 * R, -1, 16)
            sh = (jnp.uint32(15) - jnp.arange(16, dtype=jnp.uint32)) * 2
            words = (w16 << sh[None, None, :]).sum(axis=2, dtype=jnp.uint32)
            qbuf = jnp.full((2 * R, W), jnp.uint32(0xFFFFFFFF))
            qbuf = qbuf.at[:, : words.shape[1]].set(words)
            # next-N / next-valid tables via reversed cummin
            big = jnp.int32(1 << 30)

            def suffix_min(marker):
                x = jnp.where(marker, cols, big)
                sm = jnp.flip(jax.lax.cummin(jnp.flip(x, axis=1), axis=1),
                              axis=1)
                sm = jnp.concatenate([sm, jnp.full((R, 1), big)], axis=1)
                return jnp.minimum(sm, lensc)

            nf = suffix_min(valid & (m >= 4))
            nr = suffix_min(valid & (rc >= 4))
            nvf = suffix_min(valid & (m < 4))
            return qbuf, nf.astype(jnp.int32), nr.astype(jnp.int32), \
                nvf.astype(jnp.int32)

        from bwameme_tpu.utils.aot_cache import aot_jit

        return aot_jit(prep, name="prep")

    # ------------------------------------------------------------- packing
    @staticmethod
    def _batch_matrix(codes_list):
        """(R, maxlen) uint8 matrix padded with T plus lengths + RC matrix.
        Vectorized batch prep: per-read python loops cost more than the
        device dispatches they feed at production batch sizes."""
        R = len(codes_list)
        lens = np.fromiter((len(c) for c in codes_list), np.int64, R)
        maxlen = int(lens.max()) if R and lens.max() > 0 else 1
        mat = np.full((R, maxlen), 3, dtype=np.uint8)
        if R:
            # one boolean scatter instead of a per-read python loop: the
            # row-major mask order IS the concatenation order
            flat = (np.concatenate(codes_list) if len(codes_list) > 1
                    else np.asarray(codes_list[0]))
            mask = np.arange(maxlen)[None, :] < lens[:, None]
            mat[mask] = np.minimum(flat, 4)
        cols = np.arange(maxlen)
        valid = cols[None, :] < lens[:, None]
        # RC with per-row length: reverse each row within its own length
        idx = lens[:, None] - 1 - cols[None, :]
        rcm = np.where(idx >= 0, np.take_along_axis(
            mat, np.maximum(idx, 0), axis=1), 3)
        rcm = np.where((rcm < 4) & (idx >= 0), 3 - rcm, rcm).astype(np.uint8)
        mat = np.where(valid, mat, 3).astype(np.uint8)
        return mat, rcm, lens, maxlen

    @staticmethod
    def _next_n_batch(mat, lens):
        """next_n[i, j] = smallest j' >= j with mat[i, j'] >= 4, else len_i;
        shape (R, maxlen+1). Vectorized backward scan."""
        R, L = mat.shape
        out = np.empty((R, L + 1), np.int64)
        out[:, L] = lens
        nxt = lens.copy()
        for j in range(L - 1, -1, -1):
            isn = (mat[:, j] >= 4) & (j < lens)
            nxt = np.where(isn, j, np.where(j >= lens, lens, nxt))
            out[:, j] = nxt
        return out

    def _prepare(self, codes_list: list[np.ndarray]):
        R = len(codes_list)
        mat, rcm, lens, maxlen = self._batch_matrix(codes_list)
        self._select_tier(maxlen)
        W = (maxlen + 15) // 16 + 3  # +guard words (all T)
        # pack both strand matrices in one vectorized pass
        safe_f = np.where(mat >= 4, 0, mat).astype(np.uint8)
        safe_r = np.where(rcm >= 4, 0, rcm).astype(np.uint8)
        both = np.concatenate([safe_f, safe_r], axis=0)  # (2R, maxlen)
        flat = pack_words(both.reshape(-1), pad_code=3)
        wpr = both.shape[1] // 16 if both.shape[1] % 16 == 0 else None
        qbuf = np.full((2 * R, W), 0xFFFFFFFF, dtype=np.uint32)
        if wpr is not None:
            qbuf[:, :wpr] = flat.reshape(2 * R, wpr)
        else:
            # maxlen not word-aligned: pad columns to a word multiple first
            pad = (-both.shape[1]) % 16
            padded = np.concatenate(
                [both, np.full((2 * R, pad), 3, np.uint8)], axis=1)
            w = pack_words(padded.reshape(-1), pad_code=3)
            qbuf[:, : padded.shape[1] // 16] = w.reshape(2 * R, -1)
        # overwrite any packing beyond each read with T-words is unnecessary:
        # rows were already T-padded to maxlen
        nf = self._next_n_batch(mat, lens)
        nr = self._next_n_batch(rcm, lens)
        next_f = [nf[i, : lens[i] + 1] for i in range(R)]
        next_r = [nr[i, : lens[i] + 1] for i in range(R)]
        return jnp.asarray(qbuf), next_f, next_r

    @staticmethod
    def _next_valid(codes: np.ndarray) -> np.ndarray:
        """nv[i] = smallest j >= i with codes[j] < 4, else len."""
        l = len(codes)
        out = np.empty(l + 1, dtype=np.int32)
        out[l] = l
        nxt = l
        for i in range(l - 1, -1, -1):
            if codes[i] < 4:
                nxt = i
            out[i] = nxt
        return out

    @staticmethod
    def _next_valid_batch(mat, lens):
        """nv[i, j] = smallest j' >= j with mat[i, j'] < 4, else len_i."""
        R, L = mat.shape
        out = np.empty((R, L + 1), np.int64)
        out[:, L] = lens
        nxt = lens.copy()
        for j in range(L - 1, -1, -1):
            ok = (mat[:, j] < 4) & (j < lens)
            nxt = np.where(ok, j, np.where(j >= lens, lens, nxt))
            out[:, j] = nxt
        return out

    def _prepare_fused(self, codes_list: list[np.ndarray]):
        """Device tensors for the fused kernels: padded next-N / next-valid
        tables for forward and RC reads + lengths (vectorized)."""
        mat, rcm, lens, maxlen = self._batch_matrix(codes_list)
        nf = self._next_n_batch(mat, lens)
        nr = self._next_n_batch(rcm, lens)
        nvf = self._next_valid_batch(mat, lens)
        # beyond len: clamp to len (rows are T-padded so next-N would be len)
        cols = np.arange(maxlen + 1)
        beyond = cols[None, :] > lens[:, None]
        # table values are positions <= maxlen: ship the narrowest dtype and
        # widen to int32 on device (host->device link is the scarce resource)
        dt = np.uint8 if maxlen <= 255 else np.int16
        nf = np.where(beyond, lens[:, None], nf).astype(dt)
        nr = np.where(beyond, lens[:, None], nr).astype(dt)
        nvf = np.where(beyond, lens[:, None], nvf).astype(dt)
        return (jnp.asarray(nf), jnp.asarray(nr), jnp.asarray(nvf),
                jnp.asarray(lens.astype(np.int32)))

    def _query_batch(self, qbuf, rows, pivots, vs, min_intvs):
        """One batched sa_query call at the engine's fixed lane count
        (chunks transparently if the query list is larger)."""
        n = len(rows)
        if n > self.lanes:
            outs = [
                self._query_batch(qbuf, rows[i: i + self.lanes],
                                  pivots[i: i + self.lanes],
                                  vs[i: i + self.lanes],
                                  min_intvs[i: i + self.lanes])
                for i in range(0, n, self.lanes)
            ]
            return tuple(np.concatenate([o[k] for o in outs]) for k in range(3))
        lanes = self.lanes
        row = np.zeros(lanes, np.int32)
        piv = np.zeros(lanes, np.int32)
        v = np.zeros(lanes, np.int32)  # v=0 -> inert lane
        mi = np.ones(lanes, np.int32)
        row[:n], piv[:n], v[:n], mi[:n] = rows, pivots, vs, min_intvs
        mlen, lb, cnt = self.fns["sa_query"](
            self.di, qbuf, jnp.asarray(row), jnp.asarray(piv), jnp.asarray(v),
            jnp.asarray(mi),
        )
        return (np.asarray(mlen)[:n], np.asarray(lb)[:n], np.asarray(cnt)[:n])

    # -------------------------------------------------------- steps 1 and 2
    def collect_smems_batch(self, codes_list: list[np.ndarray]) -> list[list[Smem]]:
        if self.use_fused:
            try:
                return self._collect_fused(codes_list)
            except fallbacks.EXPECTED as e:
                # remote compile of the fused program can fail on constrained
                # TPU services; the host-driven path uses the same (smaller)
                # kernels and is semantically identical
                fallbacks.note("seeding.collect_fused", e)
                self.use_fused = False
        return self._collect_hostdriven(codes_list)

    def submit_batch(self, codes_list: list[np.ndarray]):
        """Enqueue the (up to) three fused seeding dispatches for a batch and
        return a token WITHOUT waiting -- JAX dispatch is async, so the
        device computes while the host works on the previous batch (the
        ktp-pipeline analog, reference: src/fastmap.cpp:730-907). Pair with
        finish_batch(). Falls back to None when the fused path is off."""
        if not self.use_fused:
            return None
        from bwameme_tpu.utils.timer import tstage

        opt = self.opt
        M = self.max_smems
        M2 = 16
        with tstage("seed.prep"):
            mat, _rcm, lens_np, maxlen = self._batch_matrix(codes_list)
            self._select_tier(maxlen)
            lens = jnp.asarray(lens_np.astype(np.int32))
            qbuf, nf, nr, nvf = self._prep_dev(jnp.asarray(mat), lens)
        # per-round times are DISPATCH wall (JAX is async; device time
        # surfaces at the blocking readback in seed.finish)
        with tstage("seed.round1"):
            d1 = self._fused_step1(
                self.di, qbuf, nf, nr, nvf, lens,
                jnp.int32(opt.min_seed_len), M=M
            )
        slots1, ns1 = d1
        d2 = None
        if self.fuse_step2:
            with tstage("seed.round2"):
                d2 = self._fused_step2(
                    self.di, qbuf, nf, nr, lens, slots1[0], slots1[1],
                    slots1[3], ns1,
                    jnp.int32(opt.split_len), jnp.int32(opt.split_width),
                    jnp.int32(opt.min_seed_len), M1=M, M2=M2,
                )
        d3 = None
        if opt.max_mem_intv > 0 and self.fuse_step3:
            with tstage("seed.round3"):
                d3 = self._fused_step3(
                    self.di, qbuf, nf, lens, jnp.int32(opt.max_mem_intv),
                    jnp.int32(opt.min_seed_len + 1), M=M,
                )
        packed = None
        if d2 is not None and (opt.max_mem_intv <= 0 or d3 is not None):
            # all rounds device-resident: enqueue the compaction dispatch so
            # only the dense sorted buffer crosses the link
            pairs = [d1, d2] + ([d3] if d3 is not None else [])
            cap = len(codes_list) * self.pack_cap_per_read
            packed = self._pack(pairs, cap)
        return (codes_list, qbuf, None, None, d1, d2, d3, packed)

    def finish_batch_flat(self, token):
        """Materialize a submit_batch token into the flat SMEM struct
        consumed by native chaining: (smem_off int32[R+1], start, end int32,
        sa_lo, hitcount int64 — all (n,) arrays, per-read runs sorted by
        (start, end)). Returns None when the packed transfer is unavailable
        or overflowed (caller uses finish_batch)."""
        packed = token[7]
        if packed is None:
            return None
        R = len(token[0])
        if isinstance(packed, tuple):  # wide path: (idt planes, counts)
            buf, counts = (np.asarray(packed[0]), np.asarray(packed[1]))
            sten_row, lb_row, cn_row = buf[0], buf[1], buf[2]
            cap = buf.shape[1]
        else:  # narrow path: one flat int32 buffer (single fetch)
            flat = np.asarray(packed)
            counts = flat[:R]
            cap = (flat.shape[0] - R) // 3
            sten_row = flat[R: R + cap]
            lb_row = flat[R + cap: R + 2 * cap]
            cn_row = flat[R + 2 * cap:]
        total = int(counts.sum())
        if total > cap:
            return None  # cap overflow: fall back to the full slot transfer
        smem_off = np.zeros(R + 1, np.int32)
        np.cumsum(counts, out=smem_off[1:])
        sten = sten_row[:total]
        start = (sten >> 10).astype(np.int32)
        end = (sten & 1023).astype(np.int32)
        lb = lb_row[:total].astype(np.int64)
        cn = cn_row[:total].astype(np.int64)
        if self.pack_nosort:
            # device compaction was sort-free (source order, grouped by
            # read): restore the (read, start, end) mem_smem_sort_lt order
            # here with one vectorized lexsort (~ms at 100K entries)
            read_ids = np.repeat(np.arange(R, dtype=np.int32), counts)
            order = np.lexsort((end, start, read_ids))
            start, end, lb, cn = (start[order], end[order], lb[order],
                                  cn[order])
        return FlatSmems(smem_off, start, end, lb, cn)

    def finish_batch(self, token) -> list[list[Smem]]:
        """Materialize a submit_batch token into per-read SMEM lists."""
        codes_list, qbuf, next_f, next_r, d1, d2, d3 = token[:7]
        opt = self.opt
        R = len(codes_list)
        if next_f is None and (d2 is None or
                               (opt.max_mem_intv > 0 and d3 is None)):
            # fallback waves need the host-side next-N tables
            _, next_f, next_r = self._prepare(codes_list)

        def unpack(d, smems, append):
            nsm = np.asarray(d[1])
            starts, ends, lbs, cnts = (np.asarray(a) for a in d[0])
            for i in range(R):
                lst = [Smem(int(starts[i, k]), int(ends[i, k]),
                            int(lbs[i, k]), int(cnts[i, k]))
                       for k in range(int(nsm[i]))]
                if append:
                    smems[i].extend(lst)
                else:
                    smems.append(lst)

        smems: list[list[Smem]] = []
        unpack(d1, smems, append=False)
        if d2 is not None:
            unpack(d2, smems, append=True)
        else:
            self._step2_host(qbuf, codes_list, next_f, next_r, smems)
        if opt.max_mem_intv > 0:
            if d3 is not None:
                unpack(d3, smems, append=True)
            else:
                self._third_round_batch(qbuf, codes_list, next_f, smems)
        return smems

    def _collect_fused(self, codes_list: list[np.ndarray]) -> list[list[Smem]]:
        """Fused path: the three seeding rounds enqueue as (up to) three
        device dispatches with NO host sync in between -- step 2 derives its
        reseed jobs on device from step 1's device-resident output, step 3 is
        independent -- followed by a single host transfer."""
        return self.finish_batch(self.submit_batch(codes_list))

    def _collect_hostdriven(self, codes_list: list[np.ndarray]) -> list[list[Smem]]:
        opt = self.opt
        R = len(codes_list)
        qbuf, next_f, next_r = self._prepare(codes_list)
        lens = [len(c) for c in codes_list]
        smems: list[list[Smem]] = [[] for _ in range(R)]

        minseed = opt.min_seed_len
        phase = np.zeros(R, np.int32)
        p = np.zeros(R, np.int64)
        next_pivot = np.zeros(R, np.int64)
        sp_before = np.zeros(R, np.int64)  # search pivot at zigzag-round start

        def enter_outer(i: int, pivot: int) -> None:
            codes = codes_list[i]
            l = lens[i]
            while True:
                if pivot >= l:
                    phase[i] = DONE
                    return
                if codes[pivot] >= 4:
                    if l - pivot < minseed:
                        phase[i] = DONE
                        return
                    pivot += 1
                    continue
                if pivot != 0 and codes[pivot - 1] < 4:
                    phase[i] = LEFT
                    p[i] = pivot
                    sp_before[i] = pivot
                    next_pivot[i] = l
                else:
                    phase[i] = RIGHT0
                    p[i] = pivot
                return

        def zigzag_continue(i: int, pnew: int) -> None:
            codes = codes_list[i]
            l = lens[i]
            while True:
                if pnew >= next_pivot[i]:
                    phase[i] = DONE
                    return
                if codes[pnew] >= 4:
                    if l - pnew < minseed:
                        phase[i] = DONE
                        return
                    pnew += 1
                    continue
                p[i] = pnew
                sp_before[i] = pnew
                phase[i] = LEFT
                return

        for i in range(R):
            if lens[i] < minseed:
                phase[i] = DONE
            else:
                enter_outer(i, 0)

        while True:
            active = np.flatnonzero(phase != DONE)
            if len(active) == 0:
                break
            rows, pivs, vs = [], [], []
            for i in active:
                pi = int(p[i])
                if phase[i] == LEFT:
                    lp = lens[i] - 1 - pi
                    rows.append(R + i)
                    pivs.append(lp)
                    vs.append(int(next_r[i][lp]) - lp)
                else:
                    rows.append(i)
                    pivs.append(pi)
                    vs.append(int(next_f[i][pi]) - pi)
            mlen, lb, cnt = self._query_batch(
                qbuf, rows, pivs, vs, [1] * len(active)
            )
            for k, i in enumerate(active):
                pi = int(p[i])
                m = int(mlen[k])
                if phase[i] == LEFT:
                    p2 = pi - m + 1
                    if next_pivot[i] - p2 < minseed:
                        phase[i] = DONE
                    else:
                        p[i] = p2
                        phase[i] = RIGHT_Z
                elif phase[i] == RIGHT_Z:
                    if m >= minseed:
                        smems[i].append(Smem(pi, pi + m, int(lb[k]), int(cnt[k])))
                    sp = pi + m
                    if sp <= sp_before[i]:  # progress guard (see host_engine)
                        sp = int(sp_before[i]) + 1
                    zigzag_continue(i, sp)
                else:  # RIGHT0
                    if m >= minseed:
                        smems[i].append(Smem(pi, pi + m, int(lb[k]), int(cnt[k])))
                    enter_outer(i, pi + max(m, 1))

        self._step2_host(qbuf, codes_list, next_f, next_r, smems)

        # ---- step 3: bwt seed strategy
        if opt.max_mem_intv > 0:
            self._third_round_batch(qbuf, codes_list, next_f, smems)

        return smems

    def _step2_host(self, qbuf, codes_list, next_f, next_r, smems) -> None:
        """Step-2 reseeding (OnePos machines per qualifying SMEM); host-driven
        batched rounds (reseeds are rare, a handful of rounds per batch)."""
        opt = self.opt
        R = len(codes_list)
        lens = [len(c) for c in codes_list]
        minseed = opt.min_seed_len
        split_len = opt.split_len
        jobs = []  # (read_i, phase, p, next_pivot, min_intv)
        for i in range(R):
            for sm in list(smems[i]):
                if (sm.end - sm.start) < split_len or sm.hitcount > opt.split_width:
                    continue
                piv = (sm.start + sm.end) >> 1
                codes = codes_list[i]
                if codes[piv] >= 4:
                    continue
                mi = sm.hitcount + 1
                if piv != 0 and codes[piv - 1] < 4:
                    jobs.append([i, "rlen", piv, 0, mi, piv])
                else:
                    jobs.append([i, "remit", piv, 0, mi, piv])

        while jobs:
            rows, pivs, vs, mis = [], [], [], []
            for j in jobs:
                i, ph, piv, npv, mi, psp = j
                if ph == "left":
                    lp = lens[i] - 1 - piv
                    rows.append(R + i)
                    pivs.append(lp)
                    vs.append(int(next_r[i][lp]) - lp)
                else:
                    rows.append(i)
                    pivs.append(piv)
                    vs.append(int(next_f[i][piv]) - piv)
                mis.append(mi)
            mlen, lb, cnt = self._query_batch(qbuf, rows, pivs, vs, mis)
            nxt = []
            for k, j in enumerate(jobs):
                i, ph, piv, npv, mi, psp = j
                m = int(mlen[k])
                if ph == "rlen":  # initial right, no emit
                    npv = piv + m
                    if piv < npv:
                        nxt.append([i, "left", piv, npv, mi, piv])
                elif ph == "left":
                    p2 = piv - m + 1
                    if npv - p2 >= minseed:
                        nxt.append([i, "remit_z", p2, npv, mi, psp])
                elif ph == "remit_z":
                    if m >= minseed:
                        smems[i].append(Smem(piv, piv + m, int(lb[k]), int(cnt[k])))
                    sp = piv + m
                    if sp <= psp:  # progress guard
                        sp = psp + 1
                    if sp < npv:
                        nxt.append([i, "left", sp, npv, mi, sp])
                else:  # "remit": pivot==0 / prev-N single right with emission
                    if m >= minseed:
                        smems[i].append(Smem(piv, piv + m, int(lb[k]), int(cnt[k])))
            jobs = nxt

    # ------------------------------------- fused step 2, device-derived
    def _build_fused_step2b(self):
        """Step 2 with job derivation ON DEVICE from step-1's (still
        device-resident) output slots: each lane is a read whose cursor scans
        its step-1 SMEM slots for qualifying reseeds (reference filter:
        src/bwamem.cpp:760-778) and runs each job's OnePos machine in place.
        No host sync between rounds -- steps 1, 2, 3 enqueue back-to-back.
        Straggler-compacted like step 1: capped full-width phase, a R//4
        continuation over the unfinished lanes, and a full-width safety
        net."""
        raw = self.fns["raw"]
        CURSOR, RLEN, LEFT2, REMZ, REM, DONE2 = 0, 1, 2, 3, 4, 5

        def tables(nf, st1, en1, cn1, nsm1, split_len, split_width, R, Lp,
                   M1):
            ks = jnp.arange(M1 + 1, dtype=jnp.int32)
            piv_all = (st1 + en1) >> 1
            # per-column flat (R,)-index gathers, NOT take_along_axis: a
            # 2-D-index gather lowers to a serialized ~10 ns/element path
            # (~1.2 ms per (R, M1+1) extraction, xplane 2026-08-20), while
            # (R,)-vector gathers ride the fast row-gather hardware; the
            # barrier keeps them out of consumer fusions
            nf_f2 = nf.reshape(-1)
            rows_off = jnp.arange(R, dtype=jnp.int32) * Lp

            def _flat_at(piv):
                cols = [jax.lax.optimization_barrier(
                            jnp.take(nf_f2,
                                     rows_off + jnp.clip(piv[:, k], 0, Lp - 1),
                                     mode="clip"))
                        for k in range(M1 + 1)]
                return jnp.stack(cols, axis=1)

            nf_at = _flat_at(piv_all)
            nf_prev = _flat_at(piv_all - 1)
            valid_all = ks[None, :] < nsm1[:, None]
            qual_all = (valid_all & (en1 - st1 >= split_len)
                        & (cn1 <= split_width) & (nf_at != piv_all))
            pv_all = (piv_all > 0) & (nf_prev != piv_all - 1)
            nxt = jnp.full((R,), M1 + 1, jnp.int32)
            cols = []
            for kk in range(M1, -1, -1):
                nxt = jnp.where(qual_all[:, kk], jnp.int32(kk), nxt)
                cols.append(nxt)
            nq_f = jnp.stack(cols[::-1], axis=1).reshape(-1)
            return (nq_f, st1.reshape(-1), en1.reshape(-1), cn1.reshape(-1),
                    pv_all.reshape(-1))

        def machinery(di, qbuf, nf, nr, lens, tabs, minseed, R, Lp, M1):
            fns = raw(di)
            nq_f, st1f_, en1f_, cn1f_, pvf_ = tabs
            nf_f = nf.reshape(-1)
            nr_f = nr.reshape(-1)

            _gb = jax.lax.optimization_barrier  # keep takes un-demoted

            def body(lanes, lens_l, st):
                def tabf(pos):
                    return _gb(jnp.take(
                        nf_f, lanes * Lp + jnp.clip(pos, 0, Lp - 1),
                        mode="clip"))

                def tabr(pos):
                    return _gb(jnp.take(
                        nr_f, lanes * Lp + jnp.clip(pos, 0, Lp - 1),
                        mode="clip"))

                phase, k = st["phase"], st["k"]
                p, npv, psp, mi = st["p"], st["npv"], st["psp"], st["mi"]
                M2 = st["starts"].shape[1] - 1

                is_cur = phase == CURSOR
                kk = jnp.clip(k, 0, M1)
                k_next = _gb(jnp.take(nq_f, lanes * (M1 + 1) + kk,
                                      mode="clip"))
                has = k_next <= M1
                idx_n = lanes * (M1 + 1) + jnp.clip(k_next, 0, M1)
                s_ = _gb(jnp.take(st1f_, idx_n, mode="clip"))
                e_ = _gb(jnp.take(en1f_, idx_n, mode="clip"))
                c_ = _gb(jnp.take(cn1f_, idx_n, mode="clip"))
                prev_valid = _gb(jnp.take(pvf_, idx_n, mode="clip"))
                piv = (s_ + e_) >> 1
                ph_from_cur = jnp.where(
                    has, jnp.where(prev_valid, RLEN, REM), DONE2
                ).astype(jnp.int32)
                phase = jnp.where(is_cur, ph_from_cur, phase)
                k = jnp.where(is_cur, k_next, k)
                p = jnp.where(is_cur & has, piv, p)
                psp = jnp.where(is_cur & has, piv, psp)
                mi = jnp.where(is_cur & has, c_ + 1, mi)
                started = is_cur & has  # machine starts NEXT iteration

                is_m = ((phase == RLEN) | (phase == LEFT2) | (phase == REMZ)
                        | (phase == REM)) & (~started)
                is_left = phase == LEFT2
                lp = lens_l - 1 - p
                row = jnp.where(is_left, R + lanes, lanes)
                piv_q = jnp.where(is_left, lp, p)
                v_raw = jnp.where(is_left, tabr(lp) - lp, tabf(p) - p)
                v = jnp.where(is_m, v_raw, 0).astype(jnp.int32)
                mlen, lb, cnt = fns["sa_query"](qbuf, row, piv_q, v, mi)
                mlen = mlen.astype(jnp.int32)
                emit = is_m & ((phase == REMZ) | (phase == REM)) & \
                    (mlen >= minseed)
                slot_o = jnp.where(emit & (st["nsm"] < M2), st["nsm"], M2)
                starts = st["starts"].at[lanes, slot_o].set(p)
                ends = st["ends"].at[lanes, slot_o].set(p + mlen)
                lbs = st["lbs"].at[lanes, slot_o].set(
                    lb.astype(st["lbs"].dtype))
                cnts = st["cnts"].at[lanes, slot_o].set(
                    cnt.astype(st["cnts"].dtype))
                nsm = st["nsm"] + (emit & (st["nsm"] < M2))

                npv_rlen = p + mlen
                ph_rlen = jnp.where(p < npv_rlen, LEFT2, DONE2)
                p2 = p - mlen + 1
                ph_left = jnp.where(npv - p2 >= minseed, REMZ, DONE2)
                sp = p + mlen
                sp = jnp.where(sp <= psp, psp + 1, sp)
                ph_remz = jnp.where(sp < npv, LEFT2, DONE2)

                new_phase = jnp.where(
                    phase == RLEN, ph_rlen,
                    jnp.where(phase == LEFT2, ph_left,
                              jnp.where(phase == REMZ, ph_remz,
                                        jnp.where(phase == REM, DONE2,
                                                  phase))))
                new_p = jnp.where(
                    phase == RLEN, p,
                    jnp.where(phase == LEFT2, p2,
                              jnp.where(phase == REMZ, sp, p)))
                new_npv = jnp.where(phase == RLEN, npv_rlen, npv)
                new_psp = jnp.where(
                    phase == RLEN, p, jnp.where(phase == REMZ, sp, psp))
                done_job = is_m & (new_phase == DONE2)
                new_phase = jnp.where(done_job, CURSOR, new_phase)
                k = jnp.where(done_job, k + 1, k)

                phase = jnp.where(is_m, new_phase.astype(jnp.int32), phase)
                p = jnp.where(is_m, new_p, p)
                npv = jnp.where(is_m, new_npv, npv)
                psp = jnp.where(is_m, new_psp, psp)
                return dict(it=st["it"] + 1, phase=phase, k=k, p=p, npv=npv,
                            psp=psp, mi=mi, nsm=nsm, starts=starts,
                            ends=ends, lbs=lbs, cnts=cnts)

            return body

        idt = self.idt

        def begin(di, qbuf, nf, nr, lens_r, st1, en1, cn1, nsm1,
                  split_len, split_width, minseed, M1, M2, cap1, K):
            nf = nf.astype(jnp.int32)
            nr = nr.astype(jnp.int32)
            R, Lp = nf.shape
            tabs = tables(nf, st1, en1, cn1, nsm1, split_len, split_width,
                          R, Lp, M1)
            body = machinery(di, qbuf, nf, nr, lens_r, tabs, minseed, R, Lp,
                             M1)
            lanes = jnp.arange(R, dtype=jnp.int32)
            st0 = dict(
                it=jnp.int32(0),
                phase=jnp.where(nsm1 > 0, CURSOR, DONE2).astype(jnp.int32),
                k=jnp.zeros(R, jnp.int32),
                p=jnp.zeros(R, jnp.int32),
                npv=jnp.zeros(R, jnp.int32),
                psp=jnp.zeros(R, jnp.int32),
                mi=jnp.ones(R, idt),
                nsm=jnp.zeros(R, jnp.int32),
                starts=jnp.zeros((R, M2 + 1), jnp.int32),
                ends=jnp.zeros((R, M2 + 1), jnp.int32),
                lbs=jnp.zeros((R, M2 + 1), idt),
                cnts=jnp.zeros((R, M2 + 1), idt),
            )

            def cond(st):
                return jnp.any(st["phase"] != DONE2) & (st["it"] < cap1)

            def bK(st):
                for _ in range(K):
                    st = body(lanes, lens_r, st)
                return st

            st = jax.lax.while_loop(cond, bK, st0)
            return (st["phase"], st["k"], st["p"], st["npv"], st["psp"],
                    st["mi"], st["nsm"],
                    (st["starts"], st["ends"], st["lbs"], st["cnts"]))

        def continue_at(di, qbuf, nf, nr, lens_r, st1, en1, cn1, nsm1,
                        split_len, split_width, minseed,
                        phase_f, k_f, p_f, npv_f, psp_f, mi_f, nsm_f, slots,
                        M1, Rc, K):
            nf = nf.astype(jnp.int32)
            nr = nr.astype(jnp.int32)
            R, Lp = nf.shape
            tabs = tables(nf, st1, en1, cn1, nsm1, split_len, split_width,
                          R, Lp, M1)
            body = machinery(di, qbuf, nf, nr, lens_r, tabs, minseed, R, Lp,
                             M1)
            if Rc:
                order = jnp.argsort((phase_f == DONE2).astype(jnp.int32),
                                    stable=True)
                lanes = order[:Rc].astype(jnp.int32)
            else:
                lanes = jnp.arange(R, dtype=jnp.int32)
            lens_l = jnp.take(lens_r, lanes)
            st0 = dict(
                it=jnp.int32(0),
                phase=jnp.take(phase_f, lanes),
                k=jnp.take(k_f, lanes),
                p=jnp.take(p_f, lanes),
                npv=jnp.take(npv_f, lanes),
                psp=jnp.take(psp_f, lanes),
                mi=jnp.take(mi_f, lanes),
                nsm=jnp.take(nsm_f, lanes),
                starts=slots[0], ends=slots[1], lbs=slots[2], cnts=slots[3],
            )

            def cond(st):
                return jnp.any(st["phase"] != DONE2)

            def bK(st):
                for _ in range(K):
                    st = body(lanes, lens_l, st)
                return st

            st = jax.lax.while_loop(cond, bK, st0)
            return (phase_f.at[lanes].set(st["phase"]),
                    k_f.at[lanes].set(st["k"]),
                    p_f.at[lanes].set(st["p"]),
                    npv_f.at[lanes].set(st["npv"]),
                    psp_f.at[lanes].set(st["psp"]),
                    mi_f.at[lanes].set(st["mi"]),
                    nsm_f.at[lanes].set(st["nsm"]),
                    (st["starts"], st["ends"], st["lbs"], st["cnts"]))

        jb = self._jit(begin, static_argnames=("M1", "M2", "cap1", "K"))
        jc = self._jit(continue_at, static_argnames=("M1", "Rc", "K"))

        def fused(di, qbuf, nf, nr, lens_r, st1, en1, cn1, nsm1,
                  split_len, split_width, minseed, M1, M2):
            cap1 = int(getattr(self, "step2_cap1", 16))
            K = int(getattr(self, "body_unroll", 4))
            st = jb(di, qbuf, nf, nr, lens_r, st1, en1, cn1, nsm1,
                    split_len, split_width, minseed, M1=M1, M2=M2,
                    cap1=cap1, K=K)
            R = nf.shape[0]
            Rc = max(64, R // int(getattr(self, "compact_frac", 4)))
            if Rc < R:
                st = jc(di, qbuf, nf, nr, lens_r, st1, en1, cn1, nsm1,
                        split_len, split_width, minseed, *st, M1=M1, Rc=Rc,
                        K=K)
            st = jc(di, qbuf, nf, nr, lens_r, st1, en1, cn1, nsm1,
                    split_len, split_width, minseed, *st, M1=M1, Rc=0, K=K)
            return st[7], st[6]

        return fused

    # ------------------------------------------------- fused device kernels
    def _build_fused_step1(self):
        """The whole step-1 zigzag sweep for a read batch as device
        programs: per-lane state machine (RIGHT0/LEFT/RIGHT_Z phases, N
        skips in closed form from next-N/next-valid tables) iterated by a
        lax.while_loop around the sa_query body.

        Straggler compaction: per-read transition counts are skewed (mean
        ~27, max ~70 on mutated 151bp reads), and every while iteration
        pays the full lane width. The sweep therefore runs as THREE chained
        dispatches: (1) full width capped at `cap1` iterations, (2) a
        continuation that compacts the unfinished lanes to width R//4 on
        device (stable argsort of the done flags) and loops them to
        completion, (3) a full-width safety net for the rare case where
        more than R//4 lanes were still alive (usually zero iterations).
        All three are enqueued back-to-back without host syncs."""
        raw = self.fns["raw"]

        def machinery(di, qbuf, nf, nr, nvf, lens_full, minseed, R, Lp):
            fns = raw(di)
            nf_f = nf.reshape(-1)
            nr_f = nr.reshape(-1)
            nvf_f = nvf.reshape(-1)

            def tab(tf, lanes, pos):
                # barrier: un-fused takes ride the fast gather hardware
                # (in-fusion demotion costs ~12 us vs ~1 us, xplane)
                return jax.lax.optimization_barrier(
                    jnp.take(tf, lanes * Lp + jnp.clip(pos, 0, Lp - 1),
                             mode="clip"))

            def skip_ns(lanes, lens_l, pivot):
                q = tab(nvf_f, lanes, pivot)
                thresh = lens_l - minseed + 1
                done_n = (q > pivot) & (q - 1 >= thresh)
                done = (pivot >= lens_l) | done_n | (q >= lens_l)
                return done, q

            def enter_outer(lanes, lens_l, pivot):
                done, q = skip_ns(lanes, lens_l, pivot)
                prev_valid = (q != 0) & (tab(nf_f, lanes, q - 1) != q - 1)
                phase = jnp.where(
                    done, DONE, jnp.where(prev_valid, LEFT, RIGHT0)
                ).astype(jnp.int32)
                return phase, q, q

            def body(lanes, lens_l, st):
                phase, p, spb = st["phase"], st["p"], st["spb"]
                active = phase != DONE
                is_left = phase == LEFT
                l = lens_l
                lp = l - 1 - p
                row = jnp.where(is_left, R + lanes, lanes)
                v_raw = jnp.where(is_left, tab(nr_f, lanes, lp) - lp,
                                  tab(nf_f, lanes, p) - p)
                piv_q = jnp.where(is_left, lp, p)
                v = jnp.where(active, v_raw, 0).astype(jnp.int32)
                mlen, lb, cnt = fns["sa_query_min1"](qbuf, row, piv_q, v)
                is_r = active & ((phase == RIGHT_Z) | (phase == RIGHT0))
                emit = is_r & (mlen >= minseed)
                nsm = st["nsm"]
                slot = jnp.where(emit & (nsm < st["M"]), nsm, st["M"])
                starts = st["starts"].at[lanes, slot].set(p.astype(jnp.int32))
                ends = st["ends"].at[lanes, slot].set(
                    (p + mlen).astype(jnp.int32))
                lbs = st["lbs"].at[lanes, slot].set(
                    lb.astype(st["lbs"].dtype))
                cnts = st["cnts"].at[lanes, slot].set(
                    cnt.astype(st["cnts"].dtype))
                nsm = nsm + (emit & (nsm < st["M"]))

                p2 = p - mlen + 1
                phL = jnp.where(l - p2 < minseed, DONE,
                                RIGHT_Z).astype(jnp.int32)
                sp = p + mlen
                sp = jnp.where(sp <= spb, spb + 1, sp)
                doneZ, qZ = skip_ns(lanes, lens_l, sp)
                phZ = jnp.where(doneZ, DONE, LEFT).astype(jnp.int32)
                piv2 = p + jnp.maximum(mlen, 1)
                ph0, p0_, spb0_ = enter_outer(lanes, lens_l, piv2)

                new_phase = jnp.where(
                    is_left, phL,
                    jnp.where(phase == RIGHT_Z, phZ,
                              jnp.where(phase == RIGHT0, ph0, DONE)),
                )
                new_p = jnp.where(
                    is_left, p2,
                    jnp.where(phase == RIGHT_Z, qZ,
                              jnp.where(phase == RIGHT0, p0_, p)),
                )
                new_spb = jnp.where(
                    phase == RIGHT_Z, qZ,
                    jnp.where(phase == RIGHT0, spb0_, spb),
                )
                return dict(
                    M=st["M"], it=st["it"] + 1,
                    phase=jnp.where(active, new_phase, phase),
                    p=jnp.where(active, new_p, p),
                    spb=jnp.where(active, new_spb, spb),
                    nsm=nsm, starts=starts, ends=ends, lbs=lbs, cnts=cnts,
                )

            return enter_outer, body

        idt = self.idt

        def begin(di, qbuf, nf, nr, nvf, lens, minseed, M, cap1, K):
            nf = nf.astype(jnp.int32)
            nr = nr.astype(jnp.int32)
            nvf = nvf.astype(jnp.int32)
            R, Lp = nf.shape
            enter_outer, body = machinery(di, qbuf, nf, nr, nvf, lens,
                                          minseed, R, Lp)
            lanes = jnp.arange(R, dtype=jnp.int32)
            phase0, p0, spb0 = enter_outer(lanes, lens,
                                           jnp.zeros(R, jnp.int32))
            phase0 = jnp.where(lens < minseed, DONE, phase0)
            st0 = dict(
                M=jnp.int32(M), it=jnp.int32(0),
                phase=phase0, p=p0, spb=spb0,
                nsm=jnp.zeros(R, jnp.int32),
                starts=jnp.zeros((R, M + 1), jnp.int32),
                ends=jnp.zeros((R, M + 1), jnp.int32),
                lbs=jnp.zeros((R, M + 1), idt),
                cnts=jnp.zeros((R, M + 1), idt),
            )

            def cond(st):
                return jnp.any(st["phase"] != DONE) & (st["it"] < cap1)

            def bK(st):  # K transitions per iteration (overhead amortizer)
                for _ in range(K):
                    st = body(lanes, lens, st)
                return st

            st = jax.lax.while_loop(cond, bK, st0)
            return (st["phase"], st["p"], st["spb"], st["nsm"],
                    (st["starts"], st["ends"], st["lbs"], st["cnts"]))

        def continue_at(di, qbuf, nf, nr, nvf, lens, minseed,
                        phase_f, p_f, spb_f, nsm_f, slots, Rc, K):
            """Compact the unfinished lanes to width Rc and run them to
            completion; Rc=0 means full width (the safety net)."""
            nf = nf.astype(jnp.int32)
            nr = nr.astype(jnp.int32)
            nvf = nvf.astype(jnp.int32)
            R, Lp = nf.shape
            enter_outer, body = machinery(di, qbuf, nf, nr, nvf, lens,
                                          minseed, R, Lp)
            if Rc:
                order = jnp.argsort((phase_f == DONE).astype(jnp.int32),
                                    stable=True)
                lanes = order[:Rc].astype(jnp.int32)
            else:
                lanes = jnp.arange(R, dtype=jnp.int32)
            lens_l = jnp.take(lens, lanes)
            st0 = dict(
                M=jnp.int32(slots[0].shape[1] - 1), it=jnp.int32(0),
                phase=jnp.take(phase_f, lanes),
                p=jnp.take(p_f, lanes),
                spb=jnp.take(spb_f, lanes),
                nsm=jnp.take(nsm_f, lanes),
                starts=slots[0], ends=slots[1], lbs=slots[2], cnts=slots[3],
            )

            def cond(st):
                return jnp.any(st["phase"] != DONE)

            def b(st):
                # per-lane nsm rides the loop; full slot planes are shared
                for _ in range(K):
                    st = body(lanes, lens_l, st)
                return st

            st = jax.lax.while_loop(cond, b, st0)
            phase_f = phase_f.at[lanes].set(st["phase"])
            p_f = p_f.at[lanes].set(st["p"])
            spb_f = spb_f.at[lanes].set(st["spb"])
            nsm_f = nsm_f.at[lanes].set(st["nsm"])
            return (phase_f, p_f, spb_f, nsm_f,
                    (st["starts"], st["ends"], st["lbs"], st["cnts"]))

        jb = self._jit(begin, static_argnames=("M", "cap1", "K"))
        jc = self._jit(continue_at, static_argnames=("Rc", "K"))

        def fused(di, qbuf, nf, nr, nvf, lens, minseed, M):
            cap1 = int(getattr(self, "step1_cap1", 30))
            K = int(getattr(self, "body_unroll", 4))
            st = jb(di, qbuf, nf, nr, nvf, lens, minseed, M=M, cap1=cap1,
                    K=K)
            R = nf.shape[0]
            Rc = max(64, R // int(getattr(self, "compact_frac", 4)))
            if Rc < R:
                st = jc(di, qbuf, nf, nr, nvf, lens, minseed, *st, Rc=Rc,
                        K=K)
            st = jc(di, qbuf, nf, nr, nvf, lens, minseed, *st, Rc=0, K=K)
            return st[4], st[3]

        return fused

    def _build_fused_step3(self):
        """Fused third round: per-read pivot sweep (closed-form skips) around
        the third_round level-walk body, as one device program."""
        raw = self.fns["raw"]
        tr_core = self._tr_core
        idt = self.idt

        def fused(di, qbuf, nf, lens, min_intv, min_seed, M):
            fns = raw(di)
            nf = nf.astype(jnp.int32)
            R, Lp = nf.shape
            lane = jnp.arange(R, dtype=jnp.int32)
            nf_f = nf.reshape(-1)

            def tab(pos):
                return jax.lax.optimization_barrier(
                    jnp.take(nf_f, lane * Lp + jnp.clip(pos, 0, Lp - 1),
                             mode="clip"))

            def resolve_skips(pv, done):
                """Advance past N pivots and short valid windows (reference:
                src/LearnedIndex_seeding.cpp:1007-1012, 997-999)."""

                def cond(st):
                    pv, done = st
                    v = tab(pv) - pv
                    need = (~done) & (pv < lens - min_seed + 1) & (v < min_seed)
                    return jnp.any(need)

                def bdy(st):
                    pv, done = st
                    done = done | (pv >= lens - min_seed + 1)
                    v = tab(pv) - pv
                    need = (~done) & (v < min_seed)
                    adv = jnp.maximum(v, 1)
                    return jnp.where(need, pv + adv, pv), done

                pv, done = jax.lax.while_loop(cond, bdy, (pv, done))
                done = done | (pv >= lens - min_seed + 1)
                return pv, done

            pv0, done0 = resolve_skips(jnp.zeros(R, jnp.int32),
                                       lens - min_seed + 1 <= 0)
            st0 = dict(
                pv=pv0, done=done0,
                nsm=jnp.zeros(R, jnp.int32),
                starts=jnp.zeros((R, M + 1), jnp.int32),
                ends=jnp.zeros((R, M + 1), jnp.int32),
                lbs=jnp.zeros((R, M + 1), idt),
                cnts=jnp.zeros((R, M + 1), idt),
            )

            def cond(st):
                return jnp.any(~st["done"])

            def body(st):
                pv, done = st["pv"], st["done"]
                v = jnp.where(done, 0, tab(pv) - pv).astype(jnp.int32)
                emit, e_len, e_lb, e_cnt, advance = tr_core(
                    fns, qbuf, lane, pv, v, min_intv, min_seed
                )
                emit = emit & (~done)
                slot = jnp.where(emit & (st["nsm"] < M), st["nsm"], M)
                starts = st["starts"].at[lane, slot].set(pv)
                ends = st["ends"].at[lane, slot].set(pv + e_len.astype(jnp.int32))
                lbs = st["lbs"].at[lane, slot].set(
                    e_lb.astype(st["lbs"].dtype))
                cnts = st["cnts"].at[lane, slot].set(
                    e_cnt.astype(st["cnts"].dtype))
                nsm = st["nsm"] + (emit & (st["nsm"] < M))
                pv2 = jnp.where(done, pv, pv + jnp.maximum(advance, 1).astype(jnp.int32))
                pv2, done2 = resolve_skips(pv2, done)
                return dict(pv=pv2, done=done2, nsm=nsm, starts=starts,
                            ends=ends, lbs=lbs, cnts=cnts)

            st = jax.lax.while_loop(cond, body, st0)
            return ((st["starts"], st["ends"], st["lbs"], st["cnts"]),
                    st["nsm"])

        return self._jit(fused, static_argnames=("M",))

    # ------------------------------------------------------------- round 3
    def _build_third_round(self):
        raw = self.fns["raw"]
        n_sa = self.di.n_sa

        def third_round_core(fns, qbuf32, row, pivot, v, min_intv, min_seed):
            lmax, _ = fns["find_longest"](qbuf32, row, pivot, jnp.maximum(v, 1))
            lmax = jnp.where(v <= 0, 0, lmax)
            active0 = lmax >= min_seed
            cur_l = jnp.maximum(lmax, 1)
            lb, cnt = fns["interval_at"](qbuf32, row, pivot, cur_l)
            prev_lb = jnp.zeros_like(lb)
            prev_cnt = jnp.zeros_like(cnt)
            emit = jnp.zeros(row.shape, jnp.bool_)
            e_len = jnp.zeros_like(cur_l)
            e_lb = jnp.zeros_like(lb)
            e_cnt = jnp.zeros_like(cnt)
            advance = jnp.where(active0, 0, min_seed)
            done = ~active0

            def cond(st):
                return jnp.any(~st[0])

            def body(st):
                done, cur_l, lb, cnt, prev_lb, prev_cnt, emit, e_len, e_lb, e_cnt, advance = st
                sat = cnt >= min_intv
                fire_sat = (~done) & sat
                do_emit_sat = fire_sat & (prev_cnt > 0)
                emit = emit | do_emit_sat
                e_len = jnp.where(do_emit_sat, cur_l + 1, e_len)
                e_lb = jnp.where(do_emit_sat, prev_lb, e_lb)
                e_cnt = jnp.where(do_emit_sat, prev_cnt, e_cnt)
                advance = jnp.where(fire_sat, cur_l + 1, advance)
                done2 = done | fire_sat

                l0 = fns["lcp_at"](qbuf32, row, pivot, cur_l, lb - 1)
                l1 = fns["lcp_at"](qbuf32, row, pivot, cur_l, lb + cnt)
                nxt = jnp.maximum(l0, l1)
                fire_low = (~done2) & (nxt < min_seed)
                emit = emit | fire_low
                e_len = jnp.where(fire_low, min_seed, e_len)
                e_lb = jnp.where(fire_low, lb, e_lb)
                e_cnt = jnp.where(fire_low, cnt, e_cnt)
                advance = jnp.where(fire_low, min_seed, advance)
                done3 = done2 | fire_low

                go = ~done3
                cur_l2 = jnp.where(go, jnp.maximum(nxt, 1), cur_l)
                lb2, cnt2 = fns["interval_at"](qbuf32, row, pivot, cur_l2)
                prev_lb2 = jnp.where(go, lb, prev_lb)
                prev_cnt2 = jnp.where(go, cnt, prev_cnt)
                lb3 = jnp.where(go, lb2, lb)
                cnt3 = jnp.where(go, cnt2, cnt)
                return (done3, cur_l2, lb3, cnt3, prev_lb2, prev_cnt2,
                        emit, e_len, e_lb, e_cnt, advance)

            st = (done, cur_l, lb, cnt, prev_lb, prev_cnt, emit, e_len, e_lb,
                  e_cnt, advance)
            st = jax.lax.while_loop(cond, body, st)
            (done, cur_l, lb, cnt, prev_lb, prev_cnt, emit, e_len, e_lb,
             e_cnt, advance) = st
            return emit, e_len, e_lb, e_cnt, advance

        self._tr_core = third_round_core

        def third_round(di, qbuf32, row, pivot, v, min_intv, min_seed):
            return third_round_core(raw(di), qbuf32, row, pivot, v, min_intv,
                                    min_seed)

        return self._jit(third_round)

    def _third_round_batch(self, qbuf, codes_list, next_f, smems) -> None:
        opt = self.opt
        R = len(codes_list)
        s = opt.min_seed_len + 1
        lens = [len(c) for c in codes_list]
        pvs = np.zeros(R, np.int64)
        act = np.ones(R, bool)
        for i in range(R):
            if lens[i] - s + 1 <= 0:
                act[i] = False
        while np.any(act):
            rows, pivs, vs, targets = [], [], [], []
            for i in np.flatnonzero(act):
                codes = codes_list[i]
                l = lens[i]
                # host-side skips: N pivots and short valid windows
                while True:
                    piv = int(pvs[i])
                    if piv >= l - s + 1:
                        act[i] = False
                        break
                    if codes[piv] >= 4:
                        pvs[i] = piv + 1
                        continue
                    v = int(next_f[i][piv]) - piv
                    if v < s:
                        pvs[i] = piv + v
                        continue
                    rows.append(i)
                    pivs.append(piv)
                    vs.append(v)
                    targets.append(i)
                    break
            if not rows:
                break
            n = len(rows)
            lanes = self.lanes
            emit = np.zeros(n, bool)
            e_len = np.zeros(n, np.int64)
            e_lb = np.zeros(n, np.int64)
            e_cnt = np.zeros(n, np.int64)
            advance = np.zeros(n, np.int64)
            for off in range(0, n, lanes):
                m = min(lanes, n - off)
                row = np.zeros(lanes, np.int32)
                piv = np.zeros(lanes, np.int32)
                v = np.zeros(lanes, np.int32)
                row[:m] = rows[off: off + m]
                piv[:m] = pivs[off: off + m]
                v[:m] = vs[off: off + m]
                em, el, elb, ec, adv = self._tr(
                    self.di, qbuf, jnp.asarray(row), jnp.asarray(piv),
                    jnp.asarray(v), jnp.int32(opt.max_mem_intv), jnp.int32(s),
                )
                emit[off: off + m] = np.asarray(em)[:m]
                e_len[off: off + m] = np.asarray(el)[:m]
                e_lb[off: off + m] = np.asarray(elb)[:m]
                e_cnt[off: off + m] = np.asarray(ec)[:m]
                advance[off: off + m] = np.asarray(adv)[:m]
            for k, i in enumerate(targets):
                piv_i = int(pvs[i])
                if emit[k]:
                    smems[i].append(
                        Smem(piv_i, piv_i + int(e_len[k]), int(e_lb[k]), int(e_cnt[k]))
                    )
                pvs[i] = piv_i + int(advance[k])

    # ------------------------------------------------------------ interface
    def sorted_smems_batch(self, codes_list: list[np.ndarray]) -> list[list[Smem]]:
        out = self.collect_smems_batch(codes_list)
        return [sorted(sm, key=lambda s: (s.start, s.end)) for sm in out]

    def sorted_smems_batch_flat(self, codes_list) -> FlatSmems | None:
        """Seeding for a batch as the flat (start,end)-sorted struct that
        native chaining consumes without building per-read Smem lists.
        None when the fused+packed path is unavailable (caller falls back to
        sorted_smems_batch)."""
        if not self.use_fused:
            return None
        try:
            token = self.submit_batch(codes_list)
        except fallbacks.EXPECTED as e:
            fallbacks.note("seeding.submit_flat", e)
            self.use_fused = False
            return None
        if token is None:
            return None
        return self.finish_batch_flat(token)

    def sorted_smems(self, codes: np.ndarray) -> list[Smem]:
        return self.sorted_smems_batch([codes])[0]
