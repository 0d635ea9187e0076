"""Device (JAX/TPU) FM-index search primitives.

TPU-native replacement for the reference's FMI hot ops (reference:
src/FMI_search.cpp:1039-1067 backwardExt, GET_OCC macro src/FMI_search.h:66-73,
get_sa_entry_compressed src/FMI_search.cpp:1117-1180):

* occ(b, p) = checkpoint count + popcount of the masked one-hot block bitmap
  — two uint32 words per (block, base), `lax.population_count` instead of
  the reference's 64-bit popcount intrinsics;
* `backward_ext_all` computes all four child intervals of a bi-interval in
  one shot (vectorized over lanes x bases — 8 gathers per lane), with the
  sentinel-offset rule for the complement side;
* forward extension swaps (k, l) and extends by the complement base —
  textF (forward+RC) is its own reverse complement;
* `sa_lookup` is the batched LF-walk for 1/8-compressed suffix positions
  (masked `lax.while_loop`, all lanes step together until every lane hits a
  stored checkpoint or the sentinel).

All arrays int32/uint32 (single-shard texts < 2^31; larger references are
sharded by the parallel layer).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
U32 = jnp.uint32
FULL = jnp.uint32(0xFFFFFFFF)

SA_COMPX = 3
SA_COMPX_MASK = (1 << SA_COMPX) - 1


@dataclasses.dataclass(frozen=True)
class DeviceFmIndex:
    count: jax.Array      # int32[5]
    cp_count: jax.Array   # int32[nb*4]   (block-major, base-minor)
    cp_bits: jax.Array    # uint32[nb*8]  (block, base, word)
    sa: jax.Array         # int32[n+1] full suffix positions
    sa_comp: jax.Array    # int32[(n>>3)+1] every-8th suffix positions
    sentinel: int
    n: int

    @staticmethod
    def from_host(fm) -> "DeviceFmIndex":
        sa_comp = (
            (fm.sa_ms_byte.astype(np.int64) << 32)
            | fm.sa_ls_word.astype(np.int64)
        ).astype(np.int32)
        return DeviceFmIndex(
            count=jnp.asarray(fm.count, dtype=jnp.int32),
            cp_count=jnp.asarray(
                fm.cp_count.astype(np.int32).reshape(-1)),
            cp_bits=jnp.asarray(fm.cp_bits.reshape(-1)),
            sa=jnp.asarray(fm.sa, dtype=jnp.int32),
            sa_comp=jnp.asarray(sa_comp),
            sentinel=int(fm.sentinel_index),
            n=int(fm.n),
        )


def _dfm_flatten(dfm):
    return ((dfm.count, dfm.cp_count, dfm.cp_bits, dfm.sa, dfm.sa_comp),
            (dfm.sentinel, dfm.n))


def _dfm_unflatten(aux, children):
    sentinel, n = aux
    count, cp_count, cp_bits, sa, sa_comp = children
    return DeviceFmIndex(count=count, cp_count=cp_count, cp_bits=cp_bits,
                         sa=sa, sa_comp=sa_comp, sentinel=sentinel, n=n)


# pytree: the FM-index must enter programs as jit parameters, not constants
jax.tree_util.register_pytree_node(DeviceFmIndex, _dfm_flatten, _dfm_unflatten)


def _high_mask(t):
    """uint32 with the top t bits set, t in [0, 32] (clamped)."""
    t = jnp.clip(t, 0, 32)
    # (FULL << (32-t)) with t=0 handled explicitly (shift by 32 is UB-ish)
    return jnp.where(
        t == 0, jnp.uint32(0),
        (FULL << (jnp.uint32(32) - t.astype(jnp.uint32))).astype(jnp.uint32),
    )


def make_fmi_fns(dfm: DeviceFmIndex):
    """Public fns take the DeviceFmIndex pytree as their FIRST argument so
    the occ tables/SA enter each program as parameters (see sa_search)."""
    sentinel = jnp.int32(dfm.sentinel)

    def build(d):
        cp_count = d.cp_count
        cp_bits = d.cp_bits
        count = d.count
        return _build_fmi_raw(cp_count, cp_bits, count, sentinel, d.sa_comp)

    public = {}
    for _name in ("occ", "backward_ext_all", "backward_ext", "forward_ext",
                  "init_intv", "sa_lookup"):
        def _mk(nm):
            @jax.jit
            def f(d, *args):
                return build(d)[nm](*args)
            f.__name__ = nm
            return f
        public[_name] = _mk(_name)
    public["raw"] = build
    return public


def _build_fmi_raw(cp_count, cp_bits, count, sentinel, sa_comp):

    def occ(b, p):
        """#occurrences of base b in bwt[0:p). b, p broadcastable int32."""
        blk = p >> 6
        off = p & 63
        cp = jnp.take(cp_count, blk * 4 + b, mode="clip")
        w0 = jnp.take(cp_bits, blk * 8 + b * 2, mode="clip")
        w1 = jnp.take(cp_bits, blk * 8 + b * 2 + 1, mode="clip")
        m0 = _high_mask(off)
        m1 = _high_mask(off - 32)
        pc = (jax.lax.population_count(w0 & m0)
              + jax.lax.population_count(w1 & m1))
        return cp + pc.astype(jnp.int32)

    def backward_ext_all(k, l, s):
        """All four children of bi-interval (k, l, s); returns (kb, lb, sb)
        each shaped (..., 4). Reference: src/FMI_search.cpp:1039-1067."""
        b = jnp.arange(4, dtype=jnp.int32)
        kk = k[..., None]
        occ_k = occ(b, kk)
        occ_ks = occ(b, kk + s[..., None])
        sb = occ_ks - occ_k
        kb = count[:4] + occ_k
        sent = ((k <= sentinel) & (k + s > sentinel)).astype(jnp.int32)
        l3 = l + sent
        l2 = l3 + sb[..., 3]
        l1 = l2 + sb[..., 2]
        l0 = l1 + sb[..., 1]
        lb = jnp.stack([l0, l1, l2, l3], axis=-1)
        return kb, lb, sb

    def backward_ext(k, l, s, a):
        kb, lb, sb = backward_ext_all(k, l, s)
        a1 = a[..., None]
        take = lambda x: jnp.take_along_axis(x, a1, axis=-1)[..., 0]
        return take(kb), take(lb), take(sb)

    def forward_ext(k, l, s, a):
        nk, nl, ns = backward_ext(l, k, s, 3 - a)
        return nl, nk, ns

    def init_intv(a):
        a = jnp.clip(a, 0, 3)
        k = jnp.take(count, a, mode="clip")
        l = jnp.take(count, 3 - a, mode="clip")
        s = jnp.take(count, a + 1, mode="clip") - k
        return k, l, s

    def sa_lookup(rank, active=None):
        """Batched compressed-SA lookup: LF-walk each lane until its rank is
        a stored checkpoint (reference: src/FMI_search.cpp:1117-1180)."""
        sp = rank.astype(jnp.int32)
        offset = jnp.zeros_like(sp)
        done = jnp.zeros(sp.shape, jnp.bool_)
        if active is not None:
            done = done | (~active)
        hit_sent = jnp.zeros(sp.shape, jnp.bool_)

        def bwt_base(p):
            blk = p >> 6
            off = p & 63
            word = off >> 5
            bit = jnp.uint32(31 - (off & 31))
            idx = blk * 8 + word
            hits = jnp.stack(
                [(jnp.take(cp_bits, idx + 2 * b, mode="clip")
                  >> bit) & jnp.uint32(1) for b in range(4)], axis=-1,
            ).astype(jnp.int32)
            b = jnp.argmax(hits, axis=-1).astype(jnp.int32)
            none = jnp.sum(hits, axis=-1) == 0
            return jnp.where(none, 4, b)

        def cond(st):
            sp, offset, done, hit_sent = st
            return jnp.any(~done)

        def body(st):
            sp, offset, done, hit_sent = st
            at_cp = (sp & SA_COMPX_MASK) == 0
            done2 = done | at_cp
            b = bwt_base(sp)
            sent_now = (~done2) & (b == 4)
            hit_sent = hit_sent | sent_now
            done3 = done2 | sent_now
            bc = jnp.clip(b, 0, 3)
            nsp = jnp.take(count, bc, mode="clip") + occ(bc, sp)
            sp2 = jnp.where(done3, sp, nsp)
            offset2 = jnp.where(done3, offset, offset + 1)
            return sp2, offset2, done3, hit_sent

        sp, offset, done, hit_sent = jax.lax.while_loop(
            cond, body, (sp, offset, done, hit_sent))
        base = jnp.take(sa_comp, sp >> SA_COMPX, mode="clip")
        return jnp.where(hit_sent, offset, base + offset)

    return dict(
        occ=occ,
        backward_ext_all=backward_ext_all,
        backward_ext=backward_ext,
        forward_ext=forward_ext,
        init_intv=init_intv,
        sa_lookup=sa_lookup,
    )
