"""Multi-device sharded suffix-array search.

Scale-out design (SURVEY.md §5 "distributed communication backend"):

* The big arrays — SA positions and the 32-base key planes (72 GB for a human
  genome in MODE2 layout) — are **sharded along the sorted suffix order**
  across the `idx` mesh axis. Because the arrays are sorted, equal block
  sharding *is* key-range sharding: shard s owns global entries
  [s*B, (s+1)*B).
* The packed 2-bit text (~1.5 GB for human) and the P-RMI leaf parameters
  (~hundreds of MB) are **replicated** — the analog of the reference keeping
  the pac resident per process.
* A query's guaranteed P-RMI window [lo, hi) may span shard boundaries; each
  shard binary-searches the intersection with its own block and the global
  lower bound is recovered with one `psum`:
      lb_global = Σ_s (lb_s − block_start_s)
  (shards entirely below the pattern contribute their full block, the owning
  shard contributes the offset, shards above contribute 0).
* Point LCP probes are answered by the owning shard and combined with `pmax`.

Reads are replicated across `idx` (they are tiny next to the index) and
sharded across the `dp` axis by the pipeline driver; collectives ride ICI.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bwameme_tpu.ops.sa_search import (
    _lcp_bases32, extract_pattern_words, keep_masks, query_word_at,
    text_word_at, FULL,
)


@dataclasses.dataclass
class ShardedIndex:
    """Host handle for the device-sharded index."""

    mesh: Mesh
    axis: str
    sa: jax.Array        # int32[N] sharded along axis
    key_hi: jax.Array    # uint32[N] sharded
    key_lo: jax.Array    # uint32[N] sharded
    text32: jax.Array    # replicated
    leaf_start: jax.Array
    alpha: jax.Array
    beta: jax.Array
    err_lo: jax.Array
    err_hi: jax.Array
    bits: int
    n_sa: int            # true (unpadded) entry count

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
        shard_spec = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        return ShardedIndex(
            mesh=mesh, axis=axis,
            sa=jax.device_put(sa, shard_spec),
            key_hi=jax.device_put(khi, shard_spec),
            key_lo=jax.device_put(klo, shard_spec),
            text32=jax.device_put(np.asarray(idx.text32, np.uint32), repl),
            leaf_start=jax.device_put(np.asarray(idx.rmi_leaf_start, np.int32), repl),
            alpha=jax.device_put(idx.rmi_alpha, repl),
            beta=jax.device_put(idx.rmi_beta, repl),
            err_lo=jax.device_put(np.asarray(idx.rmi_err_lo, np.int32), repl),
            err_hi=jax.device_put(np.asarray(idx.rmi_err_hi, np.int32), repl),
            bits=int(idx.rmi_bits),
            n_sa=n,
        )


def make_sharded_search(si: ShardedIndex):
    """Build the shard_map'ed query functions."""
    mesh = si.mesh
    axis = si.axis
    bits = si.bits
    n_sa = si.n_sa
    shift = jnp.uint32(32 - bits)
    rel_mask = jnp.uint32((1 << (32 - bits)) - 1) if bits < 32 else jnp.uint32(0)

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

    def local_suffix_cmp(sa_l, khi_l, klo_l, text32, qbuf32, row, pivot, v,
                         local_idx, block_n):
        """(less, lcp) for local entry local_idx (clipped) vs pattern[:v]."""
        idx = jnp.clip(local_idx, 0, block_n - 1)
        khi, klo = extract_pattern_words(qbuf32, row, pivot)
        skhi = jnp.take(khi_l, idx, mode="clip")
        sklo = jnp.take(klo_l, idx, mode="clip")
        x_hi = khi ^ skhi
        x_lo = klo ^ sklo
        lcp32 = jnp.where(x_hi != 0, _lcp_bases32(x_hi), 16 + _lcp_bases32(x_lo))
        vc = jnp.minimum(v, 32)
        diff_before = lcp32 < vc
        less = jnp.where(x_hi != 0, skhi < khi, sklo < klo)
        less = jnp.where(diff_before, less, False)
        lcp = jnp.minimum(lcp32, vc)
        resolved = diff_before | (v <= 32)
        tpos = jnp.take(sa_l, idx, mode="clip")

        def cond(st):
            step, resolved, less, lcp = st
            return (step < 40) & jnp.any(~resolved)

        def body(st):
            step, resolved, less, lcp = st
            off = 32 + step * 16
            qv = query_word_at(qbuf32, row, pivot + off)
            tv = text_word_at(text32, tpos + off)
            x = qv ^ tv
            chunk_lcp = _lcp_bases32(x)
            rem = v - off
            this_lcp = jnp.minimum(chunk_lcp, jnp.maximum(rem, 0))
            new_lcp = jnp.where(resolved, lcp, off + this_lcp)
            diff_in = chunk_lcp < jnp.minimum(rem, 16)
            new_less = jnp.where(resolved, less,
                                 jnp.where(diff_in, tv < qv, False))
            return step + 1, resolved | diff_in | (rem <= 16), new_less, new_lcp

        _, _, less, lcp = jax.lax.while_loop(
            cond, body, (jnp.int32(0), resolved, less, lcp)
        )
        return less, lcp

    def per_shard_lb_core(sa_l, khi_l, klo_l, text32, qbuf32, row, pivot, v,
                          lo, hi, block_n, strict):
        def cond(st):
            lo, hi = st
            return jnp.any(lo < hi)

        def body(st):
            lo, hi = st
            mid = (lo + hi) >> 1
            less, lcp = local_suffix_cmp(
                sa_l, khi_l, klo_l, text32, qbuf32, row, pivot, v, mid, block_n
            )
            pred = less | (lcp >= v) if strict else less
            active = lo < hi
            lo = jnp.where(active & pred, mid + 1, lo)
            hi = jnp.where(active & (~pred), mid, hi)
            return lo, hi

        lo, _ = jax.lax.while_loop(cond, body, (lo, hi))
        return lo

    def shard_fn(sa_l, khi_l, klo_l, text32, leaf_start, alpha, beta,
                 err_lo, err_hi, qbuf32, row, pivot, v, min_intv):
        """Per-shard body of the full sa_query (see ops/sa_search.sa_query)."""
        block_n = sa_l.shape[0]
        s_idx = jax.lax.axis_index(axis)
        block_start = s_idx.astype(jnp.int32) * block_n

        def g_lower_bound(khi_k, klo_k, vv, strict):
            wlo, whi = rmi_window(leaf_start, alpha, beta, err_lo, err_hi,
                                  khi_k, klo_k)
            lo0 = jnp.clip(wlo - block_start, 0, block_n)
            hi0 = jnp.clip(whi - block_start, 0, block_n)
            lb_local = per_shard_lb_core(
                sa_l, khi_l, klo_l, text32, qbuf32, row, pivot, vv,
                lo0, hi0, block_n, strict,
            )
            # contribution: entries below window-start in this shard are all
            # < pattern; within-window contribution = lb_local - lo0
            contrib = jnp.minimum(
                jnp.clip(wlo - block_start, 0, block_n), block_n
            ) + (lb_local - lo0)
            return jax.lax.psum(contrib, axis)

        def g_lcp(global_idx, cap):
            local = global_idx - block_start
            mine = (local >= 0) & (local < block_n) & (global_idx >= 0) & (global_idx < n_sa)
            _, lcp = local_suffix_cmp(
                sa_l, khi_l, klo_l, text32, qbuf32, row, pivot, cap,
                jnp.clip(local, 0, block_n - 1), block_n,
            )
            return jax.lax.pmax(jnp.where(mine, lcp, 0), axis)

        khi, klo = extract_pattern_words(qbuf32, row, pivot)

        def bounds_at(l):
            keep_hi, keep_lo = keep_masks(l)
            khi_a = khi & keep_hi
            klo_a = klo & keep_lo
            lb = g_lower_bound(khi_a, klo_a, l, False)
            ub = g_lower_bound(khi_a | ~keep_hi, klo_a | ~keep_lo, l, True)
            return lb, ub - lb

        # find longest: T-padded full pattern
        keep_hi, keep_lo = keep_masks(v)
        ip = g_lower_bound((khi & keep_hi) | ~keep_hi,
                           (klo & keep_lo) | ~keep_lo,
                           jnp.maximum(v, 1), False)
        l0 = g_lcp(ip - 1, jnp.maximum(v, 1))
        l1 = g_lcp(ip, jnp.maximum(v, 1))
        mlen = jnp.where(v <= 0, 0, jnp.maximum(l0, l1))

        def cond(st):
            mlen, lb, cnt, done = st
            return jnp.any(~done)

        def body(st):
            mlen, lb, cnt, done = st
            l_eff = jnp.maximum(mlen, 1)
            lb2, cnt2 = bounds_at(l_eff)
            lb2 = jnp.where(mlen == 0, 0, lb2)
            cnt2 = jnp.where(mlen == 0, n_sa, cnt2)
            sat = (cnt2 >= min_intv) | (mlen == 0)
            nxt = jnp.maximum(g_lcp(lb2 - 1, l_eff), g_lcp(lb2 + cnt2, l_eff))
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
            in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P(), P(),
                      P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
        )
    )

    def sa_query(qbuf32, row, pivot, v, min_intv):
        return sharded(
            si.sa, si.key_hi, si.key_lo, si.text32, si.leaf_start, si.alpha,
            si.beta, si.err_lo, si.err_hi, qbuf32, row, pivot, v, min_intv,
        )

    return sa_query
