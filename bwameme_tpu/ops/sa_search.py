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
    leaf_start: jax.Array  # int32[L+1]
    alpha: jax.Array       # float32[L]
    beta: jax.Array        # float32[L]
    err_lo: jax.Array      # int32[L]
    err_hi: jax.Array      # int32[L]
    bits: int              # static
    n_sa: int              # static
    isa: jax.Array | None = None  # int32[N] inverse SA (MODE3)
    kmer_table: jax.Array | None = None  # int32[4^kb+1] ERT root (see index/ert.py)
    kmer_bits: int = 0

    @staticmethod
    def from_host(idx, ert_bits: int | None = None, mesh=None,
                  shard_axis: str = "idx",
                  mode: int | None = None) -> "DeviceIndex":
        """Upload the index. With `mesh`, the two big per-suffix planes
        (sa positions, text-position keys) are SHARDED along `shard_axis`
        by equal blocks (block sharding of rank/position order), padded to
        the shard count; everything else — packed text, P-RMI parameters,
        k-mer root — is replicated, the analog of the reference keeping
        the pac resident per process (SURVEY.md §5 scale-out design).

        mode selects the HBM-resident layout, the analog of the reference's
        compile-time MODE axis (38/88/118 GB for human,
        src/LearnedIndex_seeding.h:79-88, README.md:151-156):
          3 = positions + text-position key plane (ktext; needs idx.isa) —
              fastest, ~12 B/suffix;
          2 = positions + rank-indexed key plane (key2) — ~12 B/suffix, no
              ISA needed at build;
          1 = positions only — ~4 B/suffix, every compare walks the packed
              text (suffix_cmp_pos_only);
          None = auto (3 when the ISA is available, else 2)."""
        # single-chip device coordinates are int32 (ranks AND text
        # positions); a text past 2^31 suffixes must be key-range sharded
        # over a mesh so each shard's LOCAL block stays addressable —
        # never silently truncated (VERDICT #2)
        n_shards_req = 1 if mesh is None else int(mesh.shape[shard_axis])
        if idx.n_sa >= 2**31:
            raise ValueError(
                f"n_sa={idx.n_sa} exceeds int32 device coordinates "
                f"({n_shards_req} shard(s)); global ranks/positions are "
                "int32 throughout the kernels — a >2^31-suffix text needs "
                "the int64-coordinate sharded layout (split the genome or "
                "raise shards once per-shard int64 ranks land)")
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
            mode = 3 if idx.isa is not None else 2
        if mode == 3:
            assert idx.isa is not None, "mode 3 (ktext) needs the ISA"
            kt = np.empty((len(idx.sa), 2), np.uint32)
            kt[:, 0] = idx.key_hi[idx.isa]
            kt[:, 1] = idx.key_lo[idx.isa]
            ktext = put_shard(kt)
            key2 = None
        elif mode == 2:
            ktext = None
            key2 = put_shard(
                np.stack([idx.key_hi, idx.key_lo], axis=1).astype(np.uint32))
        elif mode == 1:
            ktext = key2 = None
        else:
            raise ValueError(f"mode must be 1, 2 or 3, got {mode}")
        return DeviceIndex(
            text32=put_repl(np.asarray(idx.text32, dtype=np.uint32)),
            sa=put_shard(np.asarray(idx.sa, dtype=np.int32)),
            key2=key2,
            ktext=ktext,
            leaf_start=put_repl(np.asarray(idx.rmi_leaf_start, np.int32)),
            alpha=put_repl(idx.rmi_alpha),
            beta=put_repl(idx.rmi_beta),
            err_lo=put_repl(np.asarray(idx.rmi_err_lo, np.int32)),
            err_hi=put_repl(np.asarray(idx.rmi_err_hi, np.int32)),
            bits=int(idx.rmi_bits),
            n_sa=int(idx.n_sa),
            isa=None,  # kernels chain through ktext; the ISA itself never
            #            needs to be HBM-resident on a single chip
            kmer_table=(put_repl(kmer_table) if kmer_table is not None
                        else None),
            kmer_bits=kmer_bits,
        )

    def partition_specs(self, shard_axis: str = "idx"):
        """The DeviceIndex-shaped PartitionSpec tree matching from_host's
        placement (for shard_map in_specs)."""
        from jax.sharding import PartitionSpec as P

        return DeviceIndex(
            text32=P(), sa=P(shard_axis),
            key2=None if self.key2 is None else P(shard_axis),
            ktext=None if self.ktext is None else P(shard_axis),
            leaf_start=P(), alpha=P(), beta=P(), err_lo=P(), err_hi=P(),
            bits=self.bits, n_sa=self.n_sa,
            isa=None if self.isa is None else P(shard_axis),
            kmer_table=None if self.kmer_table is None else P(),
            kmer_bits=self.kmer_bits,
        )

def _di_flatten(di):
    children = (di.text32, di.sa, di.key2, di.ktext,
                di.leaf_start, di.alpha, di.beta, di.err_lo, di.err_hi,
                di.isa, di.kmer_table)
    return children, (di.bits, di.n_sa, di.kmer_bits)


def _di_unflatten(aux, children):
    bits, n_sa, kmer_bits = aux
    (text32, sa, key2, ktext, leaf_start, alpha, beta, err_lo,
     err_hi, isa, kmer_table) = children
    return DeviceIndex(text32=text32, sa=sa, key2=key2, ktext=ktext,
                       leaf_start=leaf_start, alpha=alpha,
                       beta=beta, err_lo=err_lo, err_hi=err_hi, bits=bits,
                       n_sa=n_sa, isa=isa, kmer_table=kmer_table,
                       kmer_bits=kmer_bits)


# DeviceIndex is a pytree so it can be a jit ARGUMENT: index arrays must
# enter programs as parameters, never as inlined constants.
jax.tree_util.register_pytree_node(DeviceIndex, _di_flatten, _di_unflatten)


def _gather_words3(buf: jax.Array, word_idx: jax.Array):
    w0 = jnp.take(buf, word_idx, axis=0, mode="clip")
    w1 = jnp.take(buf, word_idx + 1, axis=0, mode="clip")
    w2 = jnp.take(buf, word_idx + 2, axis=0, mode="clip")
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
                    root: str = "prmi", mesh=None, shard_axis: str = "idx"):
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
    shift = jnp.uint32(32 - bits)
    rel_mask = jnp.uint32((1 << (32 - bits)) - 1) if bits < 32 else jnp.uint32(0)
    n_segs = max(1, -(-(max_read_words * 16) // 32))
    if root == "kmer":
        tab = np.asarray(di.kmer_table)
        max_width = int(np.max(tab[1:] - tab[:-1])) if len(tab) > 1 else 1
    else:
        max_width = int(np.max(np.asarray(di.err_lo) + np.asarray(di.err_hi)))
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
                start = (jax.lax.axis_index(ax) * B).astype(jnp.int32)
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
        else:
            def sa_at(rank):
                return jnp.take(d.sa, jnp.clip(rank, 0, n_sa - 1),
                                mode="clip")

            def key2_at(rank):
                g = jnp.take(d.key2, jnp.clip(rank, 0, n_sa - 1), axis=0,
                             mode="clip")
                return g[..., 0], g[..., 1]

            def ktext_at(pos):
                in_range = pos < n_sa
                g = jnp.take(d.ktext, jnp.clip(pos, 0, n_sa - 1), axis=0,
                             mode="clip")
                skhi = jnp.where(in_range, g[..., 0], FULL)
                sklo = jnp.where(in_range, g[..., 1], FULL)
                return skhi, sklo

        def kmer_window(khi, klo):
            m = (khi >> jnp.uint32(32 - 2 * kmer_bits)).astype(jnp.int32)
            lo = jnp.take(d.kmer_table, m, mode="clip")
            hi = jnp.take(d.kmer_table, m + 1, mode="clip")
            return lo, hi

        def prmi_window(khi, klo):
            leaf = (khi >> shift).astype(jnp.int32)
            rel = (khi & rel_mask).astype(jnp.float32) * jnp.float32(4294967296.0) \
                + klo.astype(jnp.float32)
            ls = jnp.take(d.leaf_start, leaf, mode="clip")
            le = jnp.take(d.leaf_start, leaf + 1, mode="clip")
            cnt = (le - ls).astype(jnp.float32)
            predf = jnp.clip(
                jnp.take(d.alpha, leaf, mode="clip")
                + jnp.take(d.beta, leaf, mode="clip") * rel,
                0.0, cnt,
            )
            pred = ls + predf.astype(jnp.int32)
            lo = jnp.maximum(pred - jnp.take(d.err_lo, leaf, mode="clip"), 0)
            hi = jnp.minimum(pred + jnp.take(d.err_hi, leaf, mode="clip"), n_sa)
            return lo, hi

        rmi_window = kmer_window if root == "kmer" else prmi_window

        def deep_cmp(qbuf32, row, pivot, v, sa_idx, base_lcp, base_less,
                     resolved, start_off=32):
            """Continue comparison from base `start_off`, 16-base text
            chunks (start_off=0 is the MODE-1 positions-only tier: the
            whole compare walks the packed text)."""
            tpos = sa_at(sa_idx)

            def cond(st):
                step, resolved, less, lcp = st
                return (step < max_read_words) & jnp.any(~resolved)

            def body(st):
                step, resolved, less, lcp = st
                off = start_off + step * 16
                qv = query_word_at(qbuf32, row, pivot + off)
                tv = text_word_at(d.text32, tpos + off)
                x = qv ^ tv
                chunk_lcp = _lcp_bases32(x)
                rem = v - off
                this_lcp = jnp.minimum(chunk_lcp, jnp.maximum(rem, 0))
                new_lcp = jnp.where(resolved, lcp, off + this_lcp)
                diff_in = chunk_lcp < jnp.minimum(rem, 16)
                new_less = jnp.where(
                    resolved, less, jnp.where(diff_in, tv < qv, False)
                )
                now_resolved = resolved | diff_in | (rem <= 16)
                return step + 1, now_resolved, new_less, new_lcp

            _, resolved2, less, lcp = jax.lax.while_loop(
                cond, body, (jnp.int32(0), resolved, base_less, base_lcp)
            )
            return less, lcp

        # (key_hi, key_lo) of a suffix rank in ONE 8-byte gather (deep
        # fallback path) / 32-base key of the suffix at a text position
        # (flat path) — both shard-aware via the accessors above
        _key2_at = key2_at
        _ktext_at = ktext_at

        def suffix_cmp_flat(qbuf32, row, pivot, v, sa_idx):
            """(less, lcp) of suffix sa[sa_idx] vs pattern — no loops:
            statically unrolled 32-base segments, every segment's key ONE
            independent text-position gather from ktext (chain depth 2:
            sa -> ktext)."""
            sa_pos = sa_at(sa_idx)
            less = jnp.zeros(jnp.shape(sa_idx), jnp.bool_)
            lcp = jnp.zeros(jnp.shape(sa_idx), jnp.int32)
            resolved = jnp.zeros(jnp.shape(sa_idx), jnp.bool_)
            for k in range(n_segs):
                off = 32 * k
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
                less = jnp.where(resolved, less, less_k)
                lcp = jnp.where(resolved, lcp, lcp_k)
                resolved = resolved | diff_before | (rem <= 32)
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

        if has_ktext:
            suffix_cmp = suffix_cmp_flat
        elif di.key2 is not None:
            suffix_cmp = suffix_cmp_deep
        else:
            suffix_cmp = suffix_cmp_pos_only

        def lower_bound(qbuf32, row, pivot, v, wlo, whi, strict_greater=False):
            """First index in [wlo, whi] where suffix >= pattern[:v]
            (or > pattern[:v] when strict_greater -- may also be a per-lane
            bool array). Fixed-round unrolled binary search (window width
            < 2^lb_rounds)."""
            lo, hi = wlo, whi
            strict = strict_greater
            if not isinstance(strict, bool):
                strict = jnp.asarray(strict)
            for _ in range(lb_rounds):
                mid = (lo + hi) >> 1
                less, lcp = suffix_cmp(qbuf32, row, pivot, v, mid)
                if isinstance(strict, bool):
                    pred = less | (lcp >= v) if strict else less
                else:
                    pred = less | (strict & (lcp >= v))
                active = lo < hi
                lo = jnp.where(active & pred, mid + 1, lo)
                hi = jnp.where(active & (~pred), mid, hi)
            return lo

        def find_longest(qbuf32, row, pivot, v):
            """Max LCP of pattern over the whole SA: (mlen, best_ip). The
            two boundary probes (ip-1, ip) ride ONE double-wide round."""
            khi, klo = extract_pattern_words(qbuf32, row, pivot)
            keep_hi, keep_lo = keep_masks(v)
            khi_p = (khi & keep_hi) | ~keep_hi
            klo_p = (klo & keep_lo) | ~keep_lo
            wlo, whi = rmi_window(khi_p, klo_p)
            ip = lower_bound(qbuf32, row, pivot, v, wlo, whi)
            L = row.shape[0]
            row2 = jnp.concatenate([row, row])
            piv2 = jnp.concatenate([pivot, pivot])
            v2 = jnp.concatenate([v, v]) if jnp.ndim(v) else v
            _, l01 = suffix_cmp(qbuf32, row2, piv2, v2,
                                jnp.concatenate([ip - 1, ip]))
            return jnp.maximum(l01[:L], l01[L:]), ip

        def interval_at(qbuf32, row, pivot, l):
            """(lb, count) of the SA interval of prefix pattern[:l]. Both
            bounds ride ONE double-wide unrolled search (per-lane strict
            flag) -- half the sequential probe rounds of two searches."""
            khi, klo = extract_pattern_words(qbuf32, row, pivot)
            keep_hi, keep_lo = keep_masks(l)
            khi_a = khi & keep_hi
            klo_a = klo & keep_lo
            khi_t = khi_a | ~keep_hi
            klo_t = klo_a | ~keep_lo
            wlo_a, whi_a = rmi_window(khi_a, klo_a)
            wlo_t, whi_t = rmi_window(khi_t, klo_t)
            row2 = jnp.concatenate([row, row])
            piv2 = jnp.concatenate([pivot, pivot])
            l2 = jnp.concatenate([l, l]) if jnp.ndim(l) else l
            wlo2 = jnp.concatenate([wlo_a, wlo_t])
            whi2 = jnp.concatenate([whi_a, whi_t])
            L = row.shape[0]
            strict2 = jnp.concatenate([
                jnp.zeros(L, jnp.bool_), jnp.ones(L, jnp.bool_)])
            res = lower_bound(qbuf32, row2, piv2, l2, wlo2, whi2,
                              strict_greater=strict2)
            lb = res[:L]
            ub = res[L:]
            return lb, ub - lb

        def lcp_at(qbuf32, row, pivot, cap, sa_idx):
            """LCP of suffix sa[sa_idx] with pattern[:cap]."""
            _, l = suffix_cmp(qbuf32, row, pivot, cap, sa_idx)
            return l

        def sa_query_min1(qbuf32, row, pivot, v):
            """sa_query specialized to min_intv == 1 (every step-1 query):
            loop-free."""
            mlen, _ = find_longest(qbuf32, row, pivot, jnp.maximum(v, 1))
            mlen = jnp.where(v <= 0, 0, mlen)
            lb, cnt = interval_at(qbuf32, row, pivot, jnp.maximum(mlen, 1))
            lb = jnp.where(mlen == 0, 0, lb)
            cnt = jnp.where(mlen == 0, n_sa, cnt)
            return mlen, lb, cnt

        def sa_query(qbuf32, row, pivot, v, min_intv):
            """The widening fixed point: longest l with interval count >=
            min_intv. Returns (l, lb, cnt); v==0 lanes are inert."""
            mlen, _ = find_longest(qbuf32, row, pivot, jnp.maximum(v, 1))
            mlen = jnp.where(v <= 0, 0, mlen)

            def cond(st):
                mlen, lb, cnt, done = st
                return jnp.any(~done)

            def body(st):
                mlen, lb, cnt, done = st
                l_eff = jnp.maximum(mlen, 1)
                lb2, cnt2 = interval_at(qbuf32, row, pivot, l_eff)
                lb2 = jnp.where(mlen == 0, 0, lb2)
                cnt2 = jnp.where(mlen == 0, n_sa, cnt2)
                sat = (cnt2 >= min_intv) | (mlen == 0)
                L = row.shape[0]
                _, l01 = suffix_cmp(
                    qbuf32, jnp.concatenate([row, row]),
                    jnp.concatenate([pivot, pivot]),
                    jnp.concatenate([l_eff, l_eff]),
                    jnp.concatenate([lb2 - 1, lb2 + cnt2]))
                nxt = jnp.maximum(l01[:L], l01[L:])
                new_mlen = jnp.where(done | sat, mlen, nxt)
                new_lb = jnp.where(done, lb, lb2)
                new_cnt = jnp.where(done, cnt, cnt2)
                return new_mlen, new_lb, new_cnt, done | sat

            mlen, lb, cnt, _ = jax.lax.while_loop(
                cond, body,
                (mlen, jnp.zeros_like(mlen), jnp.zeros_like(mlen),
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
