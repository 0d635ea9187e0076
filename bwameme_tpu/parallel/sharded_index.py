"""Multi-device sharded suffix-array search.

Scale-out design (SURVEY.md §5 "distributed communication backend"):

* The big arrays — SA positions, the 32-base key planes, and the inverse
  suffix array (together ~100 GB for a human genome in the MODE-3 layout) —
  are **sharded** across the `idx` mesh axis: SA and keys along the sorted
  suffix order (equal block sharding of a sorted array IS key-range
  sharding), the ISA along text position.
* The packed 2-bit text (~1.5 GB for human) and the P-RMI leaf parameters
  (~hundreds of MB) are **replicated** — the analog of the reference keeping
  the pac resident per process.
* Every global probe (suffix rank -> SA position / suffix key) is answered
  by the owning shard and combined with one `psum` over the axis: non-owners
  contribute zero. All shards run identical control flow.

Control-flow shape mirrors the single-chip flat design
(ops/sa_search.make_search_fns): the P-RMI error window is binary-searched
in a FIXED number of unrolled rounds, and suffix compares chain through the
sharded ISA as a static unroll of key-plane gathers — so the per-probe cost
is 3 collectives (SA position, batched ISA ranks, batched continuation
keys) and the whole query body contains a single data-dependent while loop
(the interval-widening fixed point). The earlier nested-while formulation
compiled on CPU meshes but multiplied XLA compile time ~4x per nesting
level on real TPUs (see ops/sa_search.py docstring).

Reads are replicated across `idx` (they are tiny next to the index) and
sharded across the `dp` axis by the pipeline driver; collectives ride ICI.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bwameme_tpu.ops.sa_search import (
    FULL, _lcp_bases32, extract_pattern_words, keep_masks,
)


@dataclasses.dataclass
class ShardedIndex:
    """Host handle for the device-sharded index."""

    mesh: Mesh
    axis: str
    sa: jax.Array        # int32[N] sharded along axis (by suffix rank)
    key_hi: jax.Array    # uint32[N] sharded (by suffix rank)
    key_lo: jax.Array    # uint32[N] sharded (by suffix rank)
    isa: jax.Array       # int32[N] sharded (by text position)
    text32: jax.Array    # replicated
    leaf_start: jax.Array
    alpha: jax.Array
    beta: jax.Array
    err_lo: jax.Array
    err_hi: jax.Array
    bits: int
    n_sa: int            # true (unpadded) entry count
    max_err: int         # widest P-RMI window (static: bounds the search)

    @staticmethod
    def shard(idx, mesh: Mesh, axis: str = "idx") -> "ShardedIndex":
        n_shards = mesh.shape[axis]
        n = len(idx.sa)
        pad = (-n) % n_shards
        # pad with +inf keys so padded entries sort after everything
        sa = np.concatenate([idx.sa, np.zeros(pad, idx.sa.dtype)]).astype(np.int32)
        khi = np.concatenate(
            [idx.key_hi, np.full(pad, 0xFFFFFFFF, np.uint32)]
        )
        klo = np.concatenate(
            [idx.key_lo, np.full(pad, 0xFFFFFFFF, np.uint32)]
        )
        if idx.isa is None:
            raise ValueError("sharded search requires the MODE-3 ISA "
                             "(build_index(with_isa=True))")
        isa = np.concatenate(
            [idx.isa, np.zeros(pad, idx.isa.dtype)]).astype(np.int32)
        shard_spec = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        return ShardedIndex(
            mesh=mesh, axis=axis,
            sa=jax.device_put(sa, shard_spec),
            key_hi=jax.device_put(khi, shard_spec),
            key_lo=jax.device_put(klo, shard_spec),
            isa=jax.device_put(isa, shard_spec),
            text32=jax.device_put(np.asarray(idx.text32, np.uint32), repl),
            leaf_start=jax.device_put(np.asarray(idx.rmi_leaf_start, np.int32), repl),
            alpha=jax.device_put(idx.rmi_alpha, repl),
            beta=jax.device_put(idx.rmi_beta, repl),
            err_lo=jax.device_put(np.asarray(idx.rmi_err_lo, np.int32), repl),
            err_hi=jax.device_put(np.asarray(idx.rmi_err_hi, np.int32), repl),
            bits=int(idx.rmi_bits),
            n_sa=n,
            max_err=int(np.max(np.asarray(idx.rmi_err_lo)
                               + np.asarray(idx.rmi_err_hi))),
        )


def make_sharded_search(si: ShardedIndex, max_read_words: int = 40):
    """Build the shard_map'ed query function (flat design)."""
    mesh = si.mesh
    axis = si.axis
    bits = si.bits
    n_sa = si.n_sa
    shift = jnp.uint32(32 - bits)
    rel_mask = jnp.uint32((1 << (32 - bits)) - 1) if bits < 32 else jnp.uint32(0)
    lb_rounds = max(1, int(np.ceil(np.log2(si.max_err + 1)))
                    if si.max_err else 1)
    n_segs = max(1, -(-(max_read_words * 16) // 32))

    def rmi_window(leaf_start, alpha, beta, err_lo, err_hi, khi, klo):
        leaf = (khi >> shift).astype(jnp.int32)
        rel = (khi & rel_mask).astype(jnp.float32) * jnp.float32(4294967296.0) \
            + klo.astype(jnp.float32)
        ls = jnp.take(leaf_start, leaf, mode="clip")
        le = jnp.take(leaf_start, leaf + 1, mode="clip")
        cnt = (le - ls).astype(jnp.float32)
        predf = jnp.clip(jnp.take(alpha, leaf, mode="clip")
                         + jnp.take(beta, leaf, mode="clip") * rel, 0.0, cnt)
        pred = ls + predf.astype(jnp.int32)
        lo = jnp.maximum(pred - jnp.take(err_lo, leaf, mode="clip"), 0)
        hi = jnp.minimum(pred + jnp.take(err_hi, leaf, mode="clip"), n_sa)
        return lo, hi

    def shard_fn(sa_l, khi_l, klo_l, isa_l, text32, leaf_start, alpha, beta,
                 err_lo, err_hi, qbuf32, row, pivot, v, min_intv):
        """Per-shard body of the full sa_query (flat probes + psum)."""
        block_n = sa_l.shape[0]
        s_idx = jax.lax.axis_index(axis)
        block_start = s_idx.astype(jnp.int32) * block_n

        def owned(arr, global_idx, fill):
            """Owner's value of a rank/position-sharded array, psum-combined.
            Out-of-range global indexes yield `fill`."""
            local = global_idx - block_start
            mine = (local >= 0) & (local < block_n)
            val = jnp.take(arr, jnp.clip(local, 0, block_n - 1), mode="clip")
            tot = jax.lax.psum(jnp.where(mine, val, jnp.zeros_like(val)),
                               axis)
            inb = (global_idx >= 0) & (global_idx < n_sa)
            return jnp.where(inb, tot, fill)

        def suffix_cmp_impl(rank, v, rw, pv):
            sa_pos = owned(sa_l, rank, jnp.int32(0))
            if n_segs > 1:
                offs = jnp.arange(1, n_segs, dtype=jnp.int32) * 32
                pos_k = sa_pos[:, None] + offs[None, :]
                in_rng = pos_k < n_sa
                rank_k = owned(isa_l, jnp.where(in_rng, pos_k, 0),
                               jnp.int32(0))
                skhi_k = owned(khi_l, rank_k, FULL)
                sklo_k = owned(klo_l, rank_k, FULL)
                skhi_k = jnp.where(in_rng, skhi_k, FULL)
                sklo_k = jnp.where(in_rng, sklo_k, FULL)
            less = jnp.zeros(jnp.shape(rank), jnp.bool_)
            lcp = jnp.zeros(jnp.shape(rank), jnp.int32)
            resolved = jnp.zeros(jnp.shape(rank), jnp.bool_)
            for k in range(n_segs):
                off = 32 * k
                khi_p, klo_p = extract_pattern_words(qbuf32, rw, pv + off)
                if k == 0:
                    skhi = owned(khi_l, rank, FULL)
                    sklo = owned(klo_l, rank, FULL)
                else:
                    skhi = skhi_k[:, k - 1]
                    sklo = sklo_k[:, k - 1]
                x_hi = khi_p ^ skhi
                x_lo = klo_p ^ sklo
                lcp32 = jnp.where(x_hi != 0, _lcp_bases32(x_hi),
                                  16 + _lcp_bases32(x_lo))
                rem = v - off
                vc = jnp.clip(rem, 0, 32)
                diff_before = lcp32 < vc
                less_k = jnp.where(x_hi != 0, skhi < khi_p, sklo < klo_p)
                less_k = jnp.where(diff_before, less_k, False)
                lcp_k = off + jnp.minimum(lcp32, vc)
                less = jnp.where(resolved, less, less_k)
                lcp = jnp.where(resolved, lcp, lcp_k)
                resolved = resolved | diff_before | (rem <= 32)
            oob = (rank < 0) | (rank >= n_sa)
            lcp = jnp.where(oob, 0, lcp)
            less = jnp.where(rank < 0, True,
                             jnp.where(rank >= n_sa, False, less))
            return less, lcp

        khi, klo = extract_pattern_words(qbuf32, row, pivot)
        # doubled lanes for the double-wide interval search
        row2 = jnp.concatenate([row, row])
        pivot2 = jnp.concatenate([pivot, pivot])

        def lower_bound2(vv, wlo, whi, strict):
            lo, hi = wlo, whi
            for _ in range(lb_rounds):
                mid = (lo + hi) >> 1
                less, lcp = suffix_cmp_impl(mid, vv, row2, pivot2)
                pred = less | (strict & (lcp >= vv))
                active = lo < hi
                lo = jnp.where(active & pred, mid + 1, lo)
                hi = jnp.where(active & (~pred), mid, hi)
            return lo

        def interval_at2(l):
            keep_hi, keep_lo = keep_masks(l)
            khi_a = khi & keep_hi
            klo_a = klo & keep_lo
            wlo_a, whi_a = rmi_window(leaf_start, alpha, beta, err_lo,
                                      err_hi, khi_a, klo_a)
            wlo_t, whi_t = rmi_window(leaf_start, alpha, beta, err_lo,
                                      err_hi, khi_a | ~keep_hi,
                                      klo_a | ~keep_lo)
            L = row.shape[0]
            lb2 = lower_bound2(
                jnp.concatenate([l, l]),
                jnp.concatenate([wlo_a, wlo_t]),
                jnp.concatenate([whi_a, whi_t]),
                jnp.concatenate([jnp.zeros(L, jnp.bool_),
                                 jnp.ones(L, jnp.bool_)]),
            )
            return lb2[:L], lb2[L:] - lb2[:L]

        def lcp_at(cap, rank):
            _, l = suffix_cmp_impl(rank, cap,
                                   row, pivot)
            return l

        # ---- find longest: T-padded full pattern, single-wide search ----
        vv = jnp.maximum(v, 1)
        keep_hi, keep_lo = keep_masks(vv)
        khi_p = (khi & keep_hi) | ~keep_hi
        klo_p = (klo & keep_lo) | ~keep_lo
        wlo, whi = rmi_window(leaf_start, alpha, beta, err_lo, err_hi,
                              khi_p, klo_p)
        lo, hi = wlo, whi
        for _ in range(lb_rounds):
            mid = (lo + hi) >> 1
            less, _ = suffix_cmp_impl(mid, vv, row, pivot)
            active = lo < hi
            lo = jnp.where(active & less, mid + 1, lo)
            hi = jnp.where(active & (~less), mid, hi)
        ip = lo
        _, l0 = suffix_cmp_impl(ip - 1, vv, row, pivot)
        _, l1 = suffix_cmp_impl(ip, vv, row, pivot)
        mlen = jnp.where(v <= 0, 0, jnp.maximum(l0, l1))

        # ---- widening fixed point (the single while loop) ----
        def cond(st):
            mlen, lb, cnt, done = st
            return jnp.any(~done)

        def body(st):
            mlen, lb, cnt, done = st
            l_eff = jnp.maximum(mlen, 1)
            lb2, cnt2 = interval_at2(l_eff)
            lb2 = jnp.where(mlen == 0, 0, lb2)
            cnt2 = jnp.where(mlen == 0, n_sa, cnt2)
            sat = (cnt2 >= min_intv) | (mlen == 0)
            nxt = jnp.maximum(lcp_at(l_eff, lb2 - 1),
                              lcp_at(l_eff, lb2 + cnt2))
            return (jnp.where(done | sat, mlen, nxt),
                    jnp.where(done, lb, lb2),
                    jnp.where(done, cnt, cnt2),
                    done | sat)

        mlen, lb, cnt, _ = jax.lax.while_loop(
            cond, body,
            (mlen, jnp.zeros_like(mlen), jnp.zeros_like(mlen),
             jnp.zeros(mlen.shape, jnp.bool_)),
        )
        return mlen, lb, cnt

    sharded = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P(), P(),
                      P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
        )
    )

    def sa_query(qbuf32, row, pivot, v, min_intv):
        return sharded(
            si.sa, si.key_hi, si.key_lo, si.isa, si.text32, si.leaf_start,
            si.alpha, si.beta, si.err_lo, si.err_hi, qbuf32, row, pivot, v,
            min_intv,
        )

    return sa_query
