"""Device (JAX/TPU) suffix-array search primitives for learned-index seeding.

This is the TPU-native replacement for the reference's last-mile search stack
(learned_index_lookup + compare_read_and_ref_binary + mem_search /
right_smem_search, reference: src/LearnedIndex_seeding.cpp:186-3200):

* patterns are 2-bit packed reads in uint32 words (16 bases/word, MSB-first,
  so unsigned word comparison == lexicographic base comparison — the TPU
  analog of the reference's byte-shifted buffers, src/bwamem.cpp:1264-1344);
* the P-RMI predicts a guaranteed [lo, hi) window per query (see
  models/prmi.py), inside which a fixed-iteration masked binary search finds
  the lower bound — replacing the reference's unbounded linear-walk
  correction with a TPU-schedulable loop;
* suffix comparison resolves within the per-entry 32-base stored keys
  (key_hi/key_lo planes = the reference's LOADSUFFIX layout,
  src/LearnedIndex_seeding.h:79-88) and falls through to chunked 16-base
  gathers from the packed text only for >=32-base ties (rare; guarded by a
  batch-wide early-exit while_loop);
* all primitives are flat-batched over queries: (row, pivot, v) triples
  index into a (2R, W) packed query buffer whose second half holds the
  reverse-complement reads (left extensions = RC right searches, the same
  one-SA trick the reference uses).

Everything is int32/uint32; works for references up to 2^31 text length
(a human-genome-scale text is sharded across devices by the parallel layer).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32
FULL = jnp.uint32(0xFFFFFFFF)


@dataclasses.dataclass(frozen=True)
class DeviceIndex:
    """HBM-resident index arrays (see index/build.py for provenance)."""

    text32: jax.Array      # uint32[Wt] packed text (+ guard words of T)
    sa: jax.Array          # int32[N]
    key2: jax.Array | None  # uint32[N,2] rank-indexed key planes, row-fused
    #                         (only needed without ktext: the deep-compare
    #                         fallback's first segment)
    ktext: jax.Array | None  # uint32[N,2] TEXT-POSITION-indexed keys:
    #                          ktext[p] = 32-base key of the suffix starting
    #                          at p (== key2[isa[p]]). Collapses every deep
    #                          compare segment to ONE independent 8-byte
    #                          gather — no ISA hop, no rank chain.
    params: jax.Array      # uint32[L, 6] fused P-RMI leaf records:
    #                        (leaf_start, leaf_end, alpha.bits, beta.bits,
    #                         err_lo, err_hi) — ONE row gather per window
    #                        instead of six plane gathers
    bits: int              # static
    n_sa: int              # static
    isa: jax.Array | None = None  # int32[N] inverse SA (MODE3)
    kmer_table: jax.Array | None = None  # int32[4^kb+1] ERT root (see index/ert.py)
    kmer_bits: int = 0
    rk: jax.Array | None = None    # uint32[N,4] MODE-4 fused rank rows:
    #                          (sa[r], key_hi[r], key_lo[r], bases 32..48) —
    #                          one 16-byte gather yields the suffix position
    #                          AND the first 48 bases of every probe; wide
    #                          indexes widen to uint32[N,5]:
    #                          (pos_lo, pos_hi, key_hi, key_lo, b48), 20 B
    kt64: jax.Array | None = None  # RETIRED (always None): mode-4 deep
    #                          compares read the packed text directly
    #                          (text64_at) — a second multi-GB uploaded
    #                          plane put the device in a persistently
    #                          degraded gather state (2026-08-20). Field
    #                          kept for pytree shape stability.
    wide: bool = False             # int64 ranks/positions (texts >= 2^31
    #                          suffixes, e.g. human text+RC = 6.2e9); needs
    #                          jax_enable_x64; sa plane is int64 and leaf
    #                          starts come from params64
    params64: jax.Array | None = None  # int64[L+1] wide leaf-start plane:
    #                          33-bit-plus leaf bounds that no longer fit
    #                          the fused uint32 rows (errors stay in the
    #                          uint32 rows — enforced < 2^31 at upload)

    @staticmethod
    def from_host(idx, ert_bits: int | None = None, mesh=None,
                  shard_axis: str = "idx",
                  mode: int | None = None,
                  wide: bool | None = None) -> "DeviceIndex":
        """Upload the index. With `mesh`, the two big per-suffix planes
        (sa positions, text-position keys) are SHARDED along `shard_axis`
        by equal blocks (block sharding of rank/position order), padded to
        the shard count; everything else — packed text, P-RMI parameters,
        k-mer root — is replicated, the analog of the reference keeping
        the pac resident per process (SURVEY.md §5 scale-out design).

        mode selects the HBM-resident layout, the analog of the reference's
        compile-time MODE axis (38/88/118 GB for human,
        src/LearnedIndex_seeding.h:79-88, README.md:151-156):
          4 = fused rank rows (sa + first 48 bases per rank) — fastest,
              ~16 B/suffix: every probe's position AND first 48 bases cost
              ONE gather; deep (>=48-base) ties read the packed text
              directly, 5 word takes per 64 bases (needs idx.isa);
          3 = positions + text-position key plane (ktext; needs idx.isa) —
              ~12 B/suffix;
          2 = positions + rank-indexed key plane (key2) — ~12 B/suffix, no
              ISA needed at build;
          1 = positions only — ~4 B/suffix, every compare walks the packed
              text (suffix_cmp_pos_only);
          None = auto (4 when the ISA is available and the fused planes fit
          a single chip's HBM, else 3/2).

        wide selects int64 device coordinates (ranks AND text positions):
        required for texts past 2^31 suffixes (human text+RC = 6.2e9); auto
        when n_sa >= 2^31. Wide mode needs jax_enable_x64; leaf windows
        come from the int64 params64 plane, and mode-4 rank rows widen to
        20 B — (pos_lo, pos_hi, key_hi, key_lo, b48) — still one row
        gather per probe (auto stays mode 3 wide: 36 B/suffix only pays
        when the mesh has HBM to spare)."""
        def _fuse_rmi_params(idx):
            """(L, 6) uint32 leaf records: one 24-byte row gather yields the
            whole window computation's inputs (leaf_start, leaf_end,
            alpha.bits, beta.bits, err_lo, err_hi)."""
            ls = np.asarray(idx.rmi_leaf_start, np.int64)
            L = len(ls) - 1
            p = np.empty((L, 6), np.uint32)
            p[:, 0] = ls[:-1].astype(np.uint32)
            p[:, 1] = ls[1:].astype(np.uint32)
            p[:, 2] = np.asarray(idx.rmi_alpha, np.float32).view(np.uint32)
            p[:, 3] = np.asarray(idx.rmi_beta, np.float32).view(np.uint32)
            p[:, 4] = np.asarray(idx.rmi_err_lo, np.uint32)
            p[:, 5] = np.asarray(idx.rmi_err_hi, np.uint32)
            return p

        def _wide_rmi_params(idx):
            """int64[L+1] leaf-start plane for wide indexes (le = next ls);
            the f32 model bits and the error widths stay in the uint32 rows
            (a learned model whose window exceeds int32 is degenerate —
            rejected loudly rather than widened)."""
            if (np.asarray(idx.rmi_err_lo, np.int64).max(initial=0) >= 2**31
                    or np.asarray(idx.rmi_err_hi,
                                  np.int64).max(initial=0) >= 2**31):
                raise ValueError("P-RMI error window >= 2^31: degenerate "
                                 "model; retrain with more leaf bits")
            return np.asarray(idx.rmi_leaf_start, np.int64)

        n_shards_req = 1 if mesh is None else int(mesh.shape[shard_axis])
        if wide is None:
            wide = idx.n_sa >= 2**31
        if idx.n_sa >= 2**31 and not wide:
            raise ValueError(
                f"n_sa={idx.n_sa} exceeds int32 device coordinates "
                f"({n_shards_req} shard(s)) — upload with wide=True "
                "(int64 ranks/positions; requires jax_enable_x64)")
        if wide and not jax.config.jax_enable_x64:
            raise ValueError(
                f"wide index (n_sa={idx.n_sa}) needs int64 device "
                "coordinates: enable x64 first "
                "(jax.config.update('jax_enable_x64', True) or the "
                "JAX_ENABLE_X64=1 env var; the CLI does this automatically "
                "when the loaded index is >= 2^31 suffixes)")
        kmer_table = None
        kmer_bits = 0
        if ert_bits is not None:
            from bwameme_tpu.index.ert import build_kmer_table, pick_ert_bits

            kmer_bits = ert_bits if ert_bits > 0 else pick_ert_bits(idx.n_sa)
            kmer_table = jnp.asarray(build_kmer_table(idx.key_hi, kmer_bits))
        n_shards = 1
        put_shard = put_repl = jnp.asarray
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_shards = int(mesh.shape[shard_axis])
            sh = NamedSharding(mesh, PartitionSpec(shard_axis))
            rp = NamedSharding(mesh, PartitionSpec())

            def put_shard(a):
                a = np.asarray(a)
                pad = (-a.shape[0]) % n_shards
                if pad:
                    # pad ranks/positions past n_sa: every access masks by
                    # the true n_sa, so pad content never escapes
                    fill = np.zeros((pad, *a.shape[1:]), a.dtype)
                    a = np.concatenate([a, fill])
                return jax.device_put(a, sh)

            def put_repl(a):
                return jax.device_put(np.asarray(a), rp)
        if mode is None:
            # HBM-aware tier ladder (reference analog: the 38/88/118 GB
            # MODE builds, README.md:151-156). Per-shard bytes: mode 4 =
            # 16 B/suffix (rk only; deep compares read the packed text),
            # mode 3 = 12 B (sa + ktext), mode 1 = 4 B (sa only); leave
            # ~25% headroom for text32, params, query slots, and the
            # extension kernels.
            try:
                hbm = int(jax.devices()[0].memory_stats()["bytes_limit"])
            except Exception:
                hbm = 16 << 30  # v5e default
            hbm = int(os.environ.get("BWAMEME_HBM_BYTES", hbm))
            budget = int(hbm * 0.75)
            n_s = idx.n_sa // max(n_shards_req, 1)
            if idx.isa is not None and not wide and n_s * 16 <= budget:
                mode = 4
            elif idx.isa is not None and n_s * 12 <= budget:
                mode = 3
            elif idx.isa is None and n_s * 12 <= budget:
                mode = 2
            else:
                mode = 1  # positions only: compares walk the packed text
        rk = kt64 = ktext = key2 = None
        if mode == 4:
            assert idx.isa is not None, "mode 4 (rk) needs the ISA"
            n = len(idx.sa)
            from bwameme_tpu.align.native import build_mode4_rows_native

            # NOTE: mode 4 is rk-ONLY (16 B/suffix). It used to also ship
            # a 64-base text-position plane (kt64, 16 B/suffix) for deep
            # compares; measured 2026-08-20 on the v5e tunnel, touching
            # that second multi-GB uploaded plane put the device in a
            # persistently degraded state (~100x on every subsequent
            # gather) — deep compares now read the packed text directly
            # (text64_at), which is faster AND halves mode-4 HBM.
            nat = build_mode4_rows_native(idx.sa, idx.key_hi, idx.key_lo,
                                          idx.isa, wide=wide)
            if nat is not None:
                rkm = nat
            else:
                kh_t = idx.key_hi[idx.isa]  # 16 bases at text position p
                # wide rank rows carry the position as two uint32 words
                # (lo, hi) ahead of the 48 key bases — 20 B, still ONE
                # row gather per probe; narrow rows keep the 16 B layout
                pos = np.asarray(idx.sa, np.int64)
                kw = 2 if wide else 1
                rkm = np.empty((n, kw + 3), np.uint32)
                rkm[:, 0] = (pos & np.int64(0xFFFFFFFF)).astype(np.uint32)
                if wide:
                    rkm[:, 1] = (pos >> np.int64(32)).astype(np.uint32)
                rkm[:, kw] = idx.key_hi
                rkm[:, kw + 1] = idx.key_lo
                nxt = pos + 32
                rkm[:, kw + 2] = np.where(nxt < n,
                                          kh_t[np.minimum(nxt, n - 1)],
                                          np.uint32(0xFFFFFFFF))
            rk = put_shard(rkm)
        elif mode == 3:
            assert idx.isa is not None, "mode 3 (ktext) needs the ISA"
            kt = np.empty((len(idx.sa), 2), np.uint32)
            kt[:, 0] = idx.key_hi[idx.isa]
            kt[:, 1] = idx.key_lo[idx.isa]
            ktext = put_shard(kt)
        elif mode == 2:
            key2 = put_shard(
                np.stack([idx.key_hi, idx.key_lo], axis=1).astype(np.uint32))
        elif mode != 1:
            raise ValueError(f"mode must be 1, 2, 3 or 4, got {mode}")
        idt = np.int64 if wide else np.int32
        return DeviceIndex(
            text32=put_repl(np.asarray(idx.text32, dtype=np.uint32)),
            # mode 4 carries sa inside rk; the separate plane is not shipped
            sa=(put_shard(np.asarray(idx.sa, dtype=idt))
                if mode != 4 else None),
            key2=key2,
            ktext=ktext,
            params=put_repl(_fuse_rmi_params(idx)),
            bits=int(idx.rmi_bits),
            n_sa=int(idx.n_sa),
            isa=None,  # kernels chain through ktext/kt64; the ISA itself
            #            never needs to be HBM-resident on a single chip
            kmer_table=(put_repl(np.asarray(kmer_table, dtype=idt))
                        if kmer_table is not None else None),
            kmer_bits=kmer_bits,
            rk=rk, kt64=kt64,
            wide=bool(wide),
            params64=(put_repl(_wide_rmi_params(idx)) if wide else None),
        )

    def partition_specs(self, shard_axis: str = "idx"):
        """The DeviceIndex-shaped PartitionSpec tree matching from_host's
        placement (for shard_map in_specs)."""
        from jax.sharding import PartitionSpec as P

        return DeviceIndex(
            text32=P(), sa=None if self.sa is None else P(shard_axis),
            key2=None if self.key2 is None else P(shard_axis),
            ktext=None if self.ktext is None else P(shard_axis),
            params=P(),
            bits=self.bits, n_sa=self.n_sa,
            isa=None if self.isa is None else P(shard_axis),
            kmer_table=None if self.kmer_table is None else P(),
            kmer_bits=self.kmer_bits,
            rk=None if self.rk is None else P(shard_axis),
            kt64=None if self.kt64 is None else P(shard_axis),
            wide=self.wide,
            params64=None if self.params64 is None else P(),
        )

def _di_flatten(di):
    children = (di.text32, di.sa, di.key2, di.ktext, di.params,
                di.isa, di.kmer_table, di.rk, di.kt64, di.params64)
    return children, (di.bits, di.n_sa, di.kmer_bits, di.wide)


def _di_unflatten(aux, children):
    bits, n_sa, kmer_bits, wide = aux
    (text32, sa, key2, ktext, params, isa, kmer_table, rk, kt64,
     params64) = children
    return DeviceIndex(text32=text32, sa=sa, key2=key2, ktext=ktext,
                       params=params, bits=bits,
                       n_sa=n_sa, isa=isa, kmer_table=kmer_table,
                       kmer_bits=kmer_bits, rk=rk, kt64=kt64,
                       wide=wide, params64=params64)


# DeviceIndex is a pytree so it can be a jit ARGUMENT: index arrays must
# enter programs as parameters, never as inlined constants.
jax.tree_util.register_pytree_node(DeviceIndex, _di_flatten, _di_unflatten)


def _gather_words3(buf: jax.Array, word_idx: jax.Array):
    # barriers: keep each take a standalone fast-path gather (fused into a
    # consumer loop XLA demotes it to ~10 ns/element serialization)
    _gb = jax.lax.optimization_barrier
    w0 = _gb(jnp.take(buf, word_idx, axis=0, mode="clip"))
    w1 = _gb(jnp.take(buf, word_idx + 1, axis=0, mode="clip"))
    w2 = _gb(jnp.take(buf, word_idx + 2, axis=0, mode="clip"))
    return w0, w1, w2


def _combine(w0, w1, sh):
    """(w0 << sh) | (w1 >> (32-sh)) with sh==0 handled (shift clamped)."""
    rsh = jnp.minimum(jnp.uint32(32) - sh, jnp.uint32(31))
    lo = jnp.where(sh == 0, jnp.uint32(0), w1 >> rsh)
    return jnp.where(sh == 0, w0, (w0 << sh) | lo)


def _high_mask(nbits):
    """uint32 mask with the top `nbits` (0..32) bits set."""
    nb = jnp.clip(nbits, 0, 32).astype(jnp.uint32)
    m = ~(FULL >> jnp.minimum(nb, jnp.uint32(31)))
    m = jnp.where(nb == 0, jnp.uint32(0), m)
    return jnp.where(nb >= 32, FULL, m)


def keep_masks(l_bases):
    """(keep_hi, keep_lo): masks selecting the first l_bases of a 32-base
    (khi, klo) pattern."""
    b = jnp.clip(l_bases * 2, 0, 64).astype(jnp.int32)
    return _high_mask(b), _high_mask(b - 32)


def extract_pattern_words(qbuf32: jax.Array, row: jax.Array, pivot: jax.Array):
    """32-base window starting at `pivot` of packed query row -> (khi, klo)."""
    W = qbuf32.shape[1]
    flat = qbuf32.reshape(-1)
    base = row * W + (pivot >> 4)
    w0, w1, w2 = _gather_words3(flat, base)
    sh = (pivot.astype(jnp.uint32) & jnp.uint32(15)) * jnp.uint32(2)
    khi = _combine(w0, w1, sh)
    klo = _combine(w1, w2, sh)
    return khi, klo


def query_word_at(qbuf32: jax.Array, row: jax.Array, pos: jax.Array):
    """16-base word of the query starting at base position pos."""
    W = qbuf32.shape[1]
    flat = qbuf32.reshape(-1)
    base = row * W + (pos >> 4)
    w0, w1, _ = _gather_words3(flat, base)
    sh = (pos.astype(jnp.uint32) & jnp.uint32(15)) * jnp.uint32(2)
    return _combine(w0, w1, sh)


def text_word_at(text32: jax.Array, pos: jax.Array):
    w0, w1, _ = _gather_words3(text32, pos >> 4)
    sh = (pos.astype(jnp.uint32) & jnp.uint32(15)) * jnp.uint32(2)
    return _combine(w0, w1, sh)


def _msb32(x: jax.Array) -> jax.Array:
    """Index of highest set bit (x != 0), vectorized int ops."""
    x = x.astype(jnp.uint32)
    r = jnp.zeros(x.shape, jnp.uint32)
    for s in (16, 8, 4, 2, 1):
        m = x >= (jnp.uint32(1) << jnp.uint32(s))
        r = r + jnp.where(m, jnp.uint32(s), jnp.uint32(0))
        x = jnp.where(m, x >> jnp.uint32(s), x)
    return r


def _lcp_bases32(x: jax.Array) -> jax.Array:
    """Number of leading equal 2-bit bases encoded by a 32-bit xor (0..16)."""
    msb = _msb32(x)
    return jnp.where(x == 0, jnp.int32(16), (31 - msb.astype(jnp.int32)) >> 1)


@functools.partial(jax.jit, static_argnames=("need_lcp",))
def compare_keys(khi, klo, skhi, sklo, v, need_lcp=True):
    """Compare pattern (khi,klo) of length v<=32 bases with suffix key.
    Returns (less, lcp, resolved_within_32)."""
    x_hi = khi ^ skhi
    x_lo = klo ^ sklo
    lcp = jnp.where(
        x_hi != 0,
        _lcp_bases32(x_hi),
        16 + _lcp_bases32(x_lo),
    )
    vc = jnp.minimum(v, 32)
    diff_before_v = lcp < vc
    less = jnp.where(
        x_hi != 0, skhi < khi, sklo < klo
    )
    less = jnp.where(diff_before_v, less, False)
    lcp = jnp.minimum(lcp, vc)
    resolved = diff_before_v | (v <= 32)
    return less, lcp, resolved


def make_search_fns(di: DeviceIndex, max_read_words: int = 40,
                    root: str = "prmi", mesh=None, shard_axis: str = "idx",
                    max_width: int | None = None):
    """Build jitted search primitives for a device index.

    Every public fn takes the DeviceIndex (a pytree of device arrays) as its
    FIRST argument, so the index enters each program as jit *parameters* —
    never as inlined HLO constants (closing over multi-GB arrays makes the
    serialized program gigabytes big and unshippable to a remote compiler).

    root="prmi": initial window from the learned-index model (the -7 path).
    root="kmer": initial window from the ERT k-mer root table — one gather
    per (padded) key; the insertion point of any key lies inside its k-mer
    prefix block by construction (see index/ert.py).

    Control-flow shape (TPU compile time grows steeply with nested dynamic
    loops, so the query path is engineered loop-free):
    * suffix compares beyond 32 bases are FLAT when the index carries the
      MODE-3 inverse suffix array: the continuation of suffix sa[r] at depth
      32k is the stored key at rank isa[sa[r]+32k] (the ISA doubling as the
      reference's ref2sa tradeoff structure, src/LearnedIndex_seeding.cpp:
      3208-3704) — a static unroll of key gathers. Without the ISA the old
      chunked text-word while loop (deep_cmp) is used.
    * the error-window binary search is a FIXED-round static unroll: the
      P-RMI window is at most err_lo+err_hi wide; the kmer root's widest
      block is read off the table at build time.
    Result: sa_query_min1 (the step-1 workhorse) contains no loops at all.
    """
    bits = di.bits
    n_sa = di.n_sa
    kmer_bits = di.kmer_bits
    has_ktext = di.ktext is not None
    has_rk = di.rk is not None
    wide = di.wide
    IT = jnp.int64 if wide else jnp.int32  # rank/position dtype
    shift = jnp.uint32(32 - bits)
    rel_mask = jnp.uint32((1 << (32 - bits)) - 1) if bits < 32 else jnp.uint32(0)
    n_segs = max(1, -(-(max_read_words * 16) // 32))
    # MODE-4 compare shape: 48 bases ride the rank-row gather, the rest in
    # 64-base text-position rows; pattern words are prefetched per (row,
    # pivot) into a ctx so probe rounds do ZERO query-buffer gathers
    n_deep = max(0, -(-(max_read_words * 16 - 48) // 64))
    n_ctx_words = 3 + 4 * n_deep
    if max_width is None:
        # fallback: read the window bound off the device plane. Callers
        # that hold the host index pass max_width instead — this download
        # is hundreds of MB at human-scale leaf counts on a thin link.
        if root == "kmer":
            tab = np.asarray(di.kmer_table)
            max_width = int(np.max(tab[1:] - tab[:-1])) if len(tab) > 1 else 1
        else:
            p_host = np.asarray(di.params)
            max_width = int(np.max(p_host[:, 4].astype(np.int64)
                                   + p_host[:, 5].astype(np.int64)))
    # exact: a lower_bound over an exclusive window of width W converges in
    # ceil(log2(W+1)) halving rounds (verified exhaustively in tests)
    lb_rounds = max(1, int(np.ceil(np.log2(max_width + 1))) if max_width else 1)

    def build(d: DeviceIndex):
        """Raw (unjitted) search primitives over traced index arrays; use
        inside larger jitted programs (the engine's fused kernels).

        With `mesh`, the body must run INSIDE jax.shard_map over the mesh:
        `d.sa`/`d.ktext`/`d.key2` arrive as per-shard blocks (rank/position
        block sharding along `shard_axis`) and every gather is answered by
        the owning shard and combined with one psum — non-owners contribute
        zero. All shards run identical control flow, so outputs are
        replicated (SURVEY.md §5 distributed backend: index sharded by key
        range, hits combined with collectives over ICI)."""

        if mesh is not None:
            ax = shard_axis

            def _owned(arr, g):
                """Owner's row of a block-sharded plane for global index g
                (g must be pre-clipped to [0, N_pad))."""
                B = arr.shape[0]
                start = (jax.lax.axis_index(ax).astype(IT) * B)
                loc = g - start
                mine = (loc >= 0) & (loc < B)
                v = jnp.take(arr, jnp.clip(loc, 0, B - 1), axis=0,
                             mode="clip")
                if v.ndim > mine.ndim:
                    mine = mine[..., None]
                return jax.lax.psum(jnp.where(mine, v, jnp.zeros_like(v)),
                                    ax)

            def sa_at(rank):
                return _owned(d.sa, jnp.clip(rank, 0, n_sa - 1))

            def key2_at(rank):
                g = _owned(d.key2, jnp.clip(rank, 0, n_sa - 1))
                return g[..., 0], g[..., 1]

            def ktext_at(pos):
                in_range = pos < n_sa
                g = _owned(d.ktext, jnp.clip(pos, 0, n_sa - 1))
                skhi = jnp.where(in_range, g[..., 0], FULL)
                sklo = jnp.where(in_range, g[..., 1], FULL)
                return skhi, sklo

            def rk_at(rank):
                return _owned(d.rk, jnp.clip(rank, 0, n_sa - 1))
        else:
            # optimization barrier around every HBM row gather: without it
            # XLA fuses the gather into its consumer fusion and DEMOTES it
            # to a serialized element-at-a-time path — measured 30 us per
            # 4096-lane rk gather inside the fused step-1 program vs
            # 0.9 us for the identical gather standalone (xplane trace,
            # 2026-08-20; the gathers were 171 of ~390 ms/batch). The
            # barrier pins the gather as a standalone fast-path op.
            _gb = jax.lax.optimization_barrier

            def sa_at(rank):
                return _gb(jnp.take(d.sa, jnp.clip(rank, 0, n_sa - 1),
                                    mode="clip"))

            def key2_at(rank):
                g = _gb(jnp.take(d.key2, jnp.clip(rank, 0, n_sa - 1), axis=0,
                                 mode="clip"))
                return g[..., 0], g[..., 1]

            def ktext_at(pos):
                in_range = pos < n_sa
                g = _gb(jnp.take(d.ktext, jnp.clip(pos, 0, n_sa - 1), axis=0,
                                 mode="clip"))
                skhi = jnp.where(in_range, g[..., 0], FULL)
                sklo = jnp.where(in_range, g[..., 1], FULL)
                return skhi, sklo

            def rk_at(rank):
                return _gb(jnp.take(d.rk, jnp.clip(rank, 0, n_sa - 1), axis=0,
                                    mode="clip"))

        def kmer_window(khi, klo):
            m = (khi >> jnp.uint32(32 - 2 * kmer_bits)).astype(jnp.int32)
            _gb = jax.lax.optimization_barrier
            lo = _gb(jnp.take(d.kmer_table, m, mode="clip"))
            hi = _gb(jnp.take(d.kmer_table, m + 1, mode="clip"))
            return lo, hi

        def prmi_window(khi, klo):
            leaf = (khi >> shift).astype(jnp.int32)
            rel = (khi & rel_mask).astype(jnp.float32) * jnp.float32(4294967296.0) \
                + klo.astype(jnp.float32)
            # one fused 24-byte row gather: (ls, le, alpha, beta, elo, ehi);
            # barrier keeps it on the fast standalone-gather path (see the
            # accessor note above)
            rec = jax.lax.optimization_barrier(
                jnp.take(d.params, leaf, axis=0, mode="clip"))
            alpha = jax.lax.bitcast_convert_type(rec[..., 2], jnp.float32)
            beta = jax.lax.bitcast_convert_type(rec[..., 3], jnp.float32)
            elo = rec[..., 4].astype(jnp.int32)
            ehi = rec[..., 5].astype(jnp.int32)
            if wide:
                # 33-bit-plus leaf starts live in the int64 plane (the
                # uint32 rows keep the f32 model bits + error widths)
                ls = jnp.take(d.params64, leaf, mode="clip")
                le = jnp.take(d.params64, leaf + 1, mode="clip")
            else:
                ls = rec[..., 0].astype(jnp.int32)
                le = rec[..., 1].astype(jnp.int32)
            cnt = (le - ls).astype(jnp.float32)
            predf = jnp.clip(alpha + beta * rel, 0.0, cnt)
            pred = ls + predf.astype(IT)
            lo = jnp.maximum(pred - elo, 0)
            hi = jnp.minimum(pred + ehi, n_sa)
            return lo, hi

        rmi_window = kmer_window if root == "kmer" else prmi_window

        def text64_at(pos):
            """64 text bases at position pos as 4 packed 16-base words,
            straight from the ~50 MB packed text: 5 consecutive word takes
            + per-lane shifts. Replaces the former 3.2 GB kt64 plane —
            measured 2026-08-20: the moment a program touched that second
            multi-GB host-uploaded plane, EVERY subsequent gather in the
            process degraded ~100x (2 us -> 195 us, persistently); deep
            reads from the small resident text keep the device in the
            fast state, and mode 4 drops to 16 B/suffix. Word-exact match
            with the old rows: the packed text carries all-T guard words
            and clip pins past-the-end reads to them, mirroring the keys'
            T-padding."""
            base = (pos >> 4).astype(jnp.int32 if not wide else jnp.int64)
            w = [jax.lax.optimization_barrier(
                     jnp.take(d.text32, base + j, mode="clip"))
                 for j in range(5)]
            sh = (pos.astype(jnp.uint32) & jnp.uint32(15)) * jnp.uint32(2)
            in_range = pos < n_sa
            return [jnp.where(in_range, _combine(w[j], w[j + 1], sh), FULL)
                    for j in range(4)]

        def deep_cmp(qbuf32, row, pivot, v, sa_idx, base_lcp, base_less,
                     resolved, start_off=32):
            """Continue comparison from base `start_off` by statically
            unrolled 64-base text segments (start_off=0 is the MODE-1
            positions-only tier: the whole compare walks the packed
            text). Replaces the former per-16-base while loop: each
            segment is one fused round of 5 text takes + 4x3 query-word
            takes; segments after the first run under a batch-wide
            lax.cond (most lanes resolve early)."""
            tpos = sa_at(sa_idx)
            st = (base_less, base_lcp, resolved)
            total = max_read_words * 16
            n64 = max(0, -(-(total - start_off) // 64))
            for k in range(n64):
                off = start_off + 64 * k

                def seg(s, _off=off):
                    less, lcp, res = s
                    dr = text64_at(tpos + _off)
                    kw = [query_word_at(qbuf32, row, pivot + _off + 16 * j)
                          for j in range(4)]
                    lk, l64 = _multiword_cmp(dr, kw, 64)
                    rem = v - _off
                    vck = jnp.clip(rem, 0, 64)
                    diffk = l64 < vck
                    lck = _off + jnp.minimum(l64, vck)
                    lk = jnp.where(diffk, lk, False)
                    return (jnp.where(res, less, lk),
                            jnp.where(res, lcp, lck),
                            res | diffk | (rem <= 64))

                if k == 0 and start_off == 0:
                    st = seg(st)  # the first segment always runs
                else:
                    st = jax.lax.cond(jnp.any(~st[2]), seg, lambda s: s, st)
            return st[0], st[1]

        # (key_hi, key_lo) of a suffix rank in ONE 8-byte gather (deep
        # fallback path) / 32-base key of the suffix at a text position
        # (flat path) — both shard-aware via the accessors above
        _key2_at = key2_at
        _ktext_at = ktext_at

        def suffix_cmp_flat(qbuf32, row, pivot, v, sa_idx):
            """(less, lcp) of suffix sa[sa_idx] vs pattern — no loops:
            statically unrolled 32-base segments, every segment's key ONE
            independent text-position gather from ktext (chain depth 2:
            sa -> ktext). Segments past the first are LAZY (batch-wide
            lax.cond): probe rounds where every lane resolves in the first
            32 bases skip the deeper gathers (see cmp_ctx_rk)."""
            sa_pos = sa_at(sa_idx)

            def seg(st, off):
                less, lcp, resolved = st
                khi, klo = extract_pattern_words(qbuf32, row, pivot + off)
                skhi, sklo = _ktext_at(sa_pos + off)
                x_hi = khi ^ skhi
                x_lo = klo ^ sklo
                lcp32 = jnp.where(x_hi != 0, _lcp_bases32(x_hi),
                                  16 + _lcp_bases32(x_lo))
                rem = v - off
                vc = jnp.clip(rem, 0, 32)
                diff_before = lcp32 < vc
                less_k = jnp.where(x_hi != 0, skhi < khi, sklo < klo)
                less_k = jnp.where(diff_before, less_k, False)
                lcp_k = off + jnp.minimum(lcp32, vc)
                return (jnp.where(resolved, less, less_k),
                        jnp.where(resolved, lcp, lcp_k),
                        resolved | diff_before | (rem <= 32))

            st = (jnp.zeros(jnp.shape(sa_idx), jnp.bool_),
                  jnp.zeros(jnp.shape(sa_idx), jnp.int32),
                  jnp.zeros(jnp.shape(sa_idx), jnp.bool_))
            st = seg(st, 0)
            for k in range(1, n_segs):
                st = jax.lax.cond(jnp.any(~st[2]),
                                  lambda s, _off=32 * k: seg(s, _off),
                                  lambda s: s, st)
            less, lcp, _ = st
            oob = (sa_idx < 0) | (sa_idx >= n_sa)
            lcp = jnp.where(oob, 0, lcp)
            less = jnp.where(sa_idx < 0, True,
                             jnp.where(sa_idx >= n_sa, False, less))
            return less, lcp

        def suffix_cmp_deep(qbuf32, row, pivot, v, sa_idx):
            """Fallback (no ISA): key compare + chunked text while loop."""
            idx = jnp.clip(sa_idx, 0, n_sa - 1)
            khi, klo = extract_pattern_words(qbuf32, row, pivot)
            skhi, sklo = _key2_at(idx)
            x_hi = khi ^ skhi
            x_lo = klo ^ sklo
            lcp32 = jnp.where(x_hi != 0, _lcp_bases32(x_hi),
                              16 + _lcp_bases32(x_lo))
            vc = jnp.minimum(v, 32)
            diff_before = lcp32 < vc
            less0 = jnp.where(x_hi != 0, skhi < khi, sklo < klo)
            less0 = jnp.where(diff_before, less0, False)
            lcp0 = jnp.minimum(lcp32, vc)
            resolved = diff_before | (v <= 32)
            less, lcp = deep_cmp(qbuf32, row, pivot, v, idx, lcp0, less0,
                                 resolved)
            oob = (sa_idx < 0) | (sa_idx >= n_sa)
            lcp = jnp.where(oob, 0, lcp)
            less = jnp.where(sa_idx < 0, True,
                             jnp.where(sa_idx >= n_sa, False, less))
            return less, lcp

        def suffix_cmp_pos_only(qbuf32, row, pivot, v, sa_idx):
            """MODE-1 tier (positions only, no key planes): the whole
            compare walks the packed text from offset 0 — the analog of
            the reference's 38 GB build (`LOADSUFFIX=0`,
            compare_read_and_ref_binary_pos_only,
            src/LearnedIndex_seeding.cpp:431-519)."""
            idx = jnp.clip(sa_idx, 0, n_sa - 1)
            zero = jnp.zeros(jnp.shape(sa_idx), jnp.int32)
            less, lcp = deep_cmp(qbuf32, row, pivot, v, idx, zero,
                                 zero.astype(jnp.bool_), v <= 0,
                                 start_off=0)
            oob = (sa_idx < 0) | (sa_idx >= n_sa)
            lcp = jnp.where(oob, 0, lcp)
            less = jnp.where(sa_idx < 0, True,
                             jnp.where(sa_idx >= n_sa, False, less))
            return less, lcp

        # ------------------------------------------------------------ MODE-4
        def _multiword_cmp(swords, kwords, total):
            """(less, lcp_bases) of suffix words vs pattern words (16 bases
            per uint32 word, MSB-first); lcp == total when all equal."""
            shp = jnp.shape(swords[0])
            lcp = jnp.full(shp, jnp.int32(total))
            less = jnp.zeros(shp, jnp.bool_)
            found = jnp.zeros(shp, jnp.bool_)
            for i, (sw, kw) in enumerate(zip(swords, kwords)):
                x = sw ^ kw
                diff = x != 0
                new = diff & (~found)
                lcp = jnp.where(new, 16 * i + _lcp_bases32(x), lcp)
                less = jnp.where(new, sw < kw, less)
                found = found | diff
            return less, lcp

        def make_ctx_rk(qbuf32, row, pivot):
            """Prefetch the pattern's aligned 16-base words for (row, pivot)
            as K+1 statically-unrolled FLAT gathers + in-register shifts.
            Every probe round then reads pattern words from registers — no
            qbuf gathers. Flat axis-0 element gathers, NOT take_along_axis:
            a lane-axis take_along_axis lowers to a serialized in-fusion
            gather (measured 406 us per (4096, 12) extraction vs ~2 us for
            the unrolled flat form — xplane trace 2026-08-20)."""
            W = qbuf32.shape[1]
            flat = qbuf32.reshape(-1)
            base0 = row * W + jnp.minimum(pivot >> 4, W - 1)
            last = (row + 1) * W - 1
            cols = [jax.lax.optimization_barrier(
                        jnp.take(flat, jnp.minimum(base0 + k, last),
                                 mode="clip"))
                    for k in range(n_ctx_words + 1)]
            sh = (pivot.astype(jnp.uint32) & jnp.uint32(15)) * jnp.uint32(2)
            # ctx = TUPLE of (L,) word vectors (no (L, K) plane: consumers
            # read single columns, and tuples tile/concat cheaply)
            return tuple(_combine(cols[k], cols[k + 1], sh)
                         for k in range(n_ctx_words))

        def cmp_ctx_rk(aw, v, sa_idx):
            """(less, lcp) of suffix rank sa_idx vs the ctx pattern[:v]:
            rank row (position + 48 bases) in ONE 16-byte gather, deeper
            bases read straight from the packed text (text64_at).

            The deep segments are LAZY: each one's reads run under a
            batch-wide lax.cond, so probe rounds where every lane resolves
            within the stored 48 bases (most early binary-search rounds)
            skip the text traffic entirely. Identical results by
            construction: resolved lanes keep their values either way."""
            idx = jnp.clip(sa_idx, 0, n_sa - 1)
            r0 = rk_at(idx)                               # (..., 4) / (..., 5)
            if wide:
                # wide rows: (pos_lo, pos_hi, key_hi, key_lo, b48)
                sa_pos = ((r0[..., 1].astype(jnp.int64) << 32)
                          | r0[..., 0].astype(jnp.int64))
                kw = 2
            else:
                sa_pos = r0[..., 0].astype(jnp.int32)
                kw = 1
            # wide probes pass a (L, W) rank matrix: pattern words and v
            # broadcast over the candidate axis
            if jnp.ndim(sa_idx) == 2:
                def _w(k):
                    return aw[k][:, None]
                v = v[:, None] if jnp.ndim(v) == 1 else v
            else:
                def _w(k):
                    return aw[k]
            less, l48 = _multiword_cmp(
                [r0[..., kw], r0[..., kw + 1], r0[..., kw + 2]],
                [_w(0), _w(1), _w(2)], 48)
            vc = jnp.clip(v, 0, 48)
            diffb = l48 < vc
            lcp = jnp.minimum(l48, vc)
            less = jnp.where(diffb, less, False)
            resolved = diffb | (v <= 48)
            st = (less, lcp, resolved)
            # deep-segment laziness is tunable: each lax.cond saves the
            # text word reads when every lane resolves early, but costs a
            # batch-wide any() reduction per probe round — on op-count-
            # bound chips eager can win (BWAMEME_EAGER_DEEP=k runs the
            # first k segments unconditionally; default 0 = all lazy)
            import os as _os

            eager = int(_os.environ.get("BWAMEME_EAGER_DEEP", "0"))
            for k in range(n_deep):
                off = 48 + 64 * k

                def deep(st, _off=off, _k=k):
                    less, lcp, resolved = st
                    dr = text64_at(sa_pos + _off)               # 4 words
                    lk, l64 = _multiword_cmp(
                        [dr[0], dr[1], dr[2], dr[3]],
                        [_w(3 + 4 * _k), _w(4 + 4 * _k),
                         _w(5 + 4 * _k), _w(6 + 4 * _k)], 64)
                    rem = v - _off
                    vck = jnp.clip(rem, 0, 64)
                    diffk = l64 < vck
                    lck = _off + jnp.minimum(l64, vck)
                    lk = jnp.where(diffk, lk, False)
                    return (jnp.where(resolved, less, lk),
                            jnp.where(resolved, lcp, lck),
                            resolved | diffk | (rem <= 64))

                if k < eager:
                    st = deep(st)
                else:
                    st = jax.lax.cond(jnp.any(~st[2]), deep, lambda s: s, st)
            less, lcp, _ = st
            oob = (sa_idx < 0) | (sa_idx >= n_sa)
            lcp = jnp.where(oob, 0, lcp)
            less = jnp.where(sa_idx < 0, True,
                             jnp.where(sa_idx >= n_sa, False, less))
            return less, lcp

        if has_rk:
            def make_ctx(qbuf32, row, pivot):
                return make_ctx_rk(qbuf32, row, pivot)

            cmp_ctx = cmp_ctx_rk

            def ctx_tile(aw, n):
                return tuple(jnp.concatenate([c] * n) for c in aw)

            def ctx_first_words(aw):
                return aw[0], aw[1]

            def suffix_cmp(qbuf32, row, pivot, v, sa_idx):
                return cmp_ctx_rk(make_ctx_rk(qbuf32, row, pivot), v, sa_idx)
        else:
            if has_ktext:
                suffix_cmp = suffix_cmp_flat
            elif di.key2 is not None:
                suffix_cmp = suffix_cmp_deep
            else:
                suffix_cmp = suffix_cmp_pos_only

            def make_ctx(qbuf32, row, pivot):
                return (qbuf32, row, pivot)

            def cmp_ctx(ctx, v, sa_idx):
                return suffix_cmp(*ctx, v, sa_idx)

            def ctx_tile(ctx, n):
                qbuf32, row, pivot = ctx
                return (qbuf32, jnp.concatenate([row] * n),
                        jnp.concatenate([pivot] * n))

            def ctx_first_words(ctx):
                return extract_pattern_words(*ctx)

        def lower_bound_ctx(ctx, v, wlo, whi, strict_greater=False):
            """First index in [wlo, whi] where suffix >= pattern[:v]
            (or > pattern[:v] when strict_greater -- may also be a per-lane
            bool array). Fixed-round UNROLLED binary search (window width
            < 2^lb_rounds). Measured on-chip (2026-08-20, 100 Mbp): the
            unroll is ~12% faster steady-state than the equivalent
            fori_loop (XLA schedules the gather chain better); the
            tracing cost it adds is paid once per code version thanks to
            the AOT executable cache (utils/aot_cache.py)."""
            lo, hi = wlo, whi
            strict = strict_greater
            if not isinstance(strict, bool):
                strict = jnp.asarray(strict)
            for _ in range(lb_rounds):
                mid = (lo + hi) >> 1
                less, lcp = cmp_ctx(ctx, v, mid)
                if isinstance(strict, bool):
                    pred = less | (lcp >= v) if strict else less
                else:
                    pred = less | (strict & (lcp >= v))
                active = lo < hi
                lo = jnp.where(active & pred, mid + 1, lo)
                hi = jnp.where(active & (~pred), mid, hi)
            return lo

        def lower_bound(qbuf32, row, pivot, v, wlo, whi, strict_greater=False):
            return lower_bound_ctx(make_ctx(qbuf32, row, pivot), v, wlo, whi,
                                   strict_greater)

        def find_longest_ctx(ctx, v):
            khi, klo = ctx_first_words(ctx)
            keep_hi, keep_lo = keep_masks(v)
            khi_p = (khi & keep_hi) | ~keep_hi
            klo_p = (klo & keep_lo) | ~keep_lo
            wlo, whi = rmi_window(khi_p, klo_p)
            ip = lower_bound_ctx(ctx, v, wlo, whi)
            L = ip.shape[0]
            ctx2 = ctx_tile(ctx, 2)
            v2 = jnp.concatenate([v, v]) if jnp.ndim(v) else v
            _, l01 = cmp_ctx(ctx2, v2, jnp.concatenate([ip - 1, ip]))
            return jnp.maximum(l01[:L], l01[L:]), ip

        def find_longest(qbuf32, row, pivot, v):
            """Max LCP of pattern over the whole SA: (mlen, best_ip). The
            two boundary probes (ip-1, ip) ride ONE double-wide round."""
            return find_longest_ctx(make_ctx(qbuf32, row, pivot), v)

        def interval_at_ctx(ctx, l):
            khi, klo = ctx_first_words(ctx)
            keep_hi, keep_lo = keep_masks(l)
            khi_a = khi & keep_hi
            klo_a = klo & keep_lo
            khi_t = khi_a | ~keep_hi
            klo_t = klo_a | ~keep_lo
            wlo_a, whi_a = rmi_window(khi_a, klo_a)
            wlo_t, whi_t = rmi_window(khi_t, klo_t)
            ctx2 = ctx_tile(ctx, 2)
            l2 = jnp.concatenate([l, l]) if jnp.ndim(l) else l
            wlo2 = jnp.concatenate([wlo_a, wlo_t])
            whi2 = jnp.concatenate([whi_a, whi_t])
            L = wlo_a.shape[0]
            strict2 = jnp.concatenate([
                jnp.zeros(L, jnp.bool_), jnp.ones(L, jnp.bool_)])
            res = lower_bound_ctx(ctx2, l2, wlo2, whi2,
                                  strict_greater=strict2)
            lb = res[:L]
            ub = res[L:]
            return lb, ub - lb

        def interval_at(qbuf32, row, pivot, l):
            """(lb, count) of the SA interval of prefix pattern[:l]. Both
            bounds ride ONE double-wide unrolled search (per-lane strict
            flag) -- half the sequential probe rounds of two searches."""
            return interval_at_ctx(make_ctx(qbuf32, row, pivot), l)

        # ---------------------------------------------- window probe tier
        # With the P-RMI trained tight (max err window W <= ~32, true for
        # every index this builder produces at recommended bits), the
        # lower_bound over [wlo, whi) needs no sequential rounds at all:
        # ONE wide compare over the contiguous ranks wlo-1 .. wlo+W fetches
        # every candidate row in a single gather, and the bound is
        # wlo + popcount(pred) (pred is monotone along the sorted ranks).
        # This collapses sa_query_min1 from ~2*lb_rounds+2 dependent probe
        # rounds to 2 — the chip is op-count-bound, not bandwidth-bound
        # (ARCHITECTURE.md "device trace findings"), so fewer, wider
        # rounds win. Replaces the reference's last-mile loop
        # (src/LearnedIndex_seeding.cpp:2262-2293) rather than
        # translating it.
        import os as _os

        # measured SLOWER than the unrolled binary on the real chip
        # (2026-08-20: 3.7k vs 8.2k reads/s at 100 Mbp — the (L, W) ops
        # bloat every while-body; rounds are not the cost, per-iteration
        # overhead is, see engine.body_unroll) — kept as an opt-in for
        # future chips where gather fan-in is the constraint
        use_window = (
            has_rk
            and max_width + 2 <= int(_os.environ.get(
                "BWAMEME_WINDOW_CAP", "34"))
            and _os.environ.get("BWAMEME_WINDOW_PROBE", "0") == "1"
        )
        if use_window:
            WN = int(max_width) + 2
            offs = jnp.arange(WN, dtype=jnp.int32)

            def _probe(ctx, v, wlo, whi):
                """(base, less, lcp, ip_helper) over ranks base+j,
                j in [0, WN); base = wlo - 1."""
                base = wlo - 1
                ranks = base[:, None] + offs[None, :].astype(base.dtype)
                less, lcp = cmp_ctx(ctx, v, ranks)          # (L, WN)
                return base, ranks, less, lcp

            def _count_bound(wlo, whi, ranks, pred):
                inwin = (ranks >= wlo[:, None]) & (ranks < whi[:, None])
                return wlo + jnp.sum(pred & inwin, axis=1).astype(wlo.dtype)

            def _col(lcp_mat, base, rank):
                c = jnp.clip((rank - base).astype(jnp.int32), 0, WN - 1)
                return jnp.take_along_axis(lcp_mat, c[:, None], 1)[:, 0]

            def find_longest_ctx_w(ctx, v):
                khi, klo = ctx_first_words(ctx)
                keep_hi, keep_lo = keep_masks(v)
                khi_p = (khi & keep_hi) | ~keep_hi
                klo_p = (klo & keep_lo) | ~keep_lo
                wlo, whi = rmi_window(khi_p, klo_p)
                base, ranks, less, lcp = _probe(ctx, v, wlo, whi)
                ip = _count_bound(wlo, whi, ranks, less)
                # the two boundary lcps ride the SAME probe matrix
                mlen = jnp.maximum(_col(lcp, base, ip - 1),
                                   _col(lcp, base, ip))
                return mlen, ip

            def _interval_w(ctx, l):
                """(lb, cnt, l_below, l_above): interval of pattern[:l] and
                the LCPs just outside it (the widening fixed point's nxt
                inputs), all from ONE double-lane wide probe."""
                khi, klo = ctx_first_words(ctx)
                keep_hi, keep_lo = keep_masks(l)
                khi_a = khi & keep_hi
                klo_a = klo & keep_lo
                khi_t = khi_a | ~keep_hi
                klo_t = klo_a | ~keep_lo
                wlo_a, whi_a = rmi_window(khi_a, klo_a)
                wlo_t, whi_t = rmi_window(khi_t, klo_t)
                L = wlo_a.shape[0]
                ctx2 = ctx_tile(ctx, 2)
                l2 = jnp.concatenate([l, l]) if jnp.ndim(l) else l
                wlo2 = jnp.concatenate([wlo_a, wlo_t])
                whi2 = jnp.concatenate([whi_a, whi_t])
                base, ranks, less, lcp = _probe(ctx2, l2, wlo2, whi2)
                full = lcp >= (l2[:, None] if jnp.ndim(l2) else l2)
                strict2 = jnp.concatenate([
                    jnp.zeros((L, 1), jnp.bool_), jnp.ones((L, 1), jnp.bool_)])
                pred = less | (strict2 & full)
                res = _count_bound(wlo2, whi2, ranks, pred)
                lb = res[:L]
                ub = res[L:]
                l_below = _col(lcp[:L], base[:L], lb - 1)
                l_above = _col(lcp[L:], base[L:], ub)
                return lb, ub - lb, l_below, l_above

            def interval_at_ctx_w(ctx, l):
                lb, cnt, _, _ = _interval_w(ctx, l)
                return lb, cnt

            find_longest_ctx = find_longest_ctx_w
            interval_at_ctx = interval_at_ctx_w

            def find_longest(qbuf32, row, pivot, v):
                return find_longest_ctx_w(make_ctx(qbuf32, row, pivot), v)

            def interval_at(qbuf32, row, pivot, l):
                return interval_at_ctx_w(make_ctx(qbuf32, row, pivot), l)

        def lcp_at(qbuf32, row, pivot, cap, sa_idx):
            """LCP of suffix sa[sa_idx] with pattern[:cap]."""
            _, l = suffix_cmp(qbuf32, row, pivot, cap, sa_idx)
            return l

        def sa_query_min1(qbuf32, row, pivot, v):
            """sa_query specialized to min_intv == 1 (every step-1 query):
            loop-free; the pattern ctx is prefetched ONCE and shared by all
            ~2*lb_rounds+2 probe rounds."""
            ctx = make_ctx(qbuf32, row, pivot)
            mlen, _ = find_longest_ctx(ctx, jnp.maximum(v, 1))
            mlen = jnp.where(v <= 0, 0, mlen)
            lb, cnt = interval_at_ctx(ctx, jnp.maximum(mlen, 1))
            lb = jnp.where(mlen == 0, 0, lb)
            cnt = jnp.where(mlen == 0, n_sa, cnt)
            return mlen, lb, cnt

        def sa_query(qbuf32, row, pivot, v, min_intv):
            """The widening fixed point: longest l with interval count >=
            min_intv. Returns (l, lb, cnt); v==0 lanes are inert."""
            ctx = make_ctx(qbuf32, row, pivot)
            if not use_window:
                ctx2 = ctx_tile(ctx, 2)
            mlen, _ = find_longest_ctx(ctx, jnp.maximum(v, 1))
            mlen = jnp.where(v <= 0, 0, mlen)
            L = mlen.shape[0]

            def cond(st):
                mlen, lb, cnt, done = st
                return jnp.any(~done)

            def body(st):
                mlen, lb, cnt, done = st
                l_eff = jnp.maximum(mlen, 1)
                if use_window:
                    # ONE wide probe yields the interval AND the just-
                    # outside LCPs the widening step needs
                    lb2, cnt2, l_below, l_above = _interval_w(ctx, l_eff)
                    nxt = jnp.maximum(l_below, l_above)
                else:
                    lb2, cnt2 = interval_at_ctx(ctx, l_eff)
                lb2 = jnp.where(mlen == 0, 0, lb2)
                cnt2 = jnp.where(mlen == 0, n_sa, cnt2)
                sat = (cnt2 >= min_intv) | (mlen == 0)
                if not use_window:
                    _, l01 = cmp_ctx(
                        ctx2, jnp.concatenate([l_eff, l_eff]),
                        jnp.concatenate([lb2 - 1, lb2 + cnt2]))
                    nxt = jnp.maximum(l01[:L], l01[L:])
                new_mlen = jnp.where(done | sat, mlen, nxt)
                new_lb = jnp.where(done, lb, lb2)
                new_cnt = jnp.where(done, cnt, cnt2)
                return new_mlen, new_lb, new_cnt, done | sat

            mlen, lb, cnt, _ = jax.lax.while_loop(
                cond, body,
                (mlen, jnp.zeros(mlen.shape, IT), jnp.zeros(mlen.shape, IT),
                 jnp.zeros(mlen.shape, jnp.bool_)),
            )
            return mlen, lb, cnt

        return dict(
            rmi_window=rmi_window,
            suffix_cmp=suffix_cmp,
            find_longest=find_longest,
            interval_at=interval_at,
            lcp_at=lcp_at,
            sa_query=sa_query,
            sa_query_min1=sa_query_min1,
        )

    public = {}
    if mesh is None:
        for _name in ("rmi_window", "suffix_cmp", "find_longest",
                      "interval_at", "lcp_at", "sa_query", "sa_query_min1"):
            def _mk(nm):
                @jax.jit
                def f(d, *args):
                    return build(d)[nm](*args)
                f.__name__ = nm
                return f
            public[_name] = _mk(_name)
    else:
        # multi-device: each public fn is one shard_map'ed program — index
        # planes per-shard, queries replicated, outputs replicated (every
        # shard computes identical results from the psum-combined gathers)
        for _name, _nargs in (("rmi_window", 2), ("suffix_cmp", 5),
                              ("find_longest", 4), ("interval_at", 4),
                              ("lcp_at", 5), ("sa_query", 5),
                              ("sa_query_min1", 4)):
            public[_name] = shard_wrap(
                lambda d, *args, _nm=_name: build(d)[_nm](*args),
                di=di, mesh=mesh, shard_axis=shard_axis, n_args=_nargs)
    public["raw"] = build
    return public


def shard_wrap(fn, di: DeviceIndex, mesh, shard_axis: str, n_args: int):
    """jit(shard_map(fn)) with the DeviceIndex as first argument (planes
    per-shard) and `n_args` replicated array arguments; outputs replicated.
    check is disabled: the replication of psum-combined results is by
    construction, not inferable."""
    from jax.sharding import PartitionSpec as P

    di_spec = di.partition_specs(shard_axis)
    smapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(di_spec, *([P()] * n_args)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)
