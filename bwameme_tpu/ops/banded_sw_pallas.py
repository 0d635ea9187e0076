"""Pallas (Mosaic TPU) banded Smith-Waterman extension kernel.

The whole DP for a tile of pairs runs as ONE kernel: the row state
(ehh/ehe) lives in VMEM scratch for all T rows instead of riding an XLA
while-loop carry, and each row is the same fused VPU sweep as the XLA
formulation in ops/banded_sw.py:_sw_core — bit-identical semantics
(adaptive begin/end band pruning, z-dropoff, row-zero termination, gscore
bookkeeping of scalarBandedSWA, reference: src/bandedSWA.cpp:116-238).

Mosaic layout: everything is TRANSPOSED relative to the XLA kernel — pairs
ride the LANE dimension (tile B=128) and query positions the sublane
dimension, so per-pair scalars are (1, B) rank-2 rows (Mosaic's layout
inference rejects rank-1 vectors) and the dynamic DP-row load from the
(T, B) target block is a sublane slice (dynamic lane indexing must be
128-aligned; sublane indexing is free).

The in-row F (insertion) chain uses the same decaying-prefix-max identity,
computed as a Hillis-Steele max-scan (log2 W shifted maxima along
sublanes) because lax.cummax is not a Mosaic primitive.

Grid = batch tiles of B pairs; per-tile VMEM: the query score profile
(5, W, B), the target codes (T, B) and two (W, B) state planes — ~1 MB at
B=128, W=256, T=512.

Selected via BWAMEME_PALLAS=1 (see ops/banded_sw.py) once measured on real
chips; interpret mode is differentially tested against the XLA kernel on
every suite run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -(1 << 28)  # plain int: a jnp scalar would be a captured constant


def _scan_max(u, W):
    """Inclusive running maximum along axis 0 (Hillis-Steele)."""
    k = 1
    while k < W:
        shifted = jnp.pad(u[:-k, :], ((k, 0), (0, 0)),
                          constant_values=NEG_BIG)
        u = jnp.maximum(u, shifted)
        k <<= 1
    return u


def _kernel(qp_ref, t_ref, par_ref,
            score_ref, qle_ref, tle_ref, gtle_ref, gsc_ref, moff_ref,
            ehh_ref, ehe_ref,
            *, T, W, o_del, e_del, o_ins, e_ins, end_bonus, zdrop):
    B = par_ref.shape[1]
    oe_ins = o_ins + e_ins
    jj = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)   # query pos
    par = par_ref[:]            # (4, B): qlen, tlen, h0, w_eff
    qlen = par[0:1, :]          # (1, B)
    tlen = par[1:2, :]
    h0 = par[2:3, :]
    w_eff = par[3:4, :]

    # ---- first row init (reference: bandedSWA.cpp:143-147) ----
    v = h0 - oe_ins - (jj - 1) * e_ins
    ehh0 = jnp.where(jj == 0, h0, jnp.maximum(v, 0))
    ehh_ref[:] = jnp.where(jj <= qlen, ehh0, 0).astype(jnp.int32)
    ehe_ref[:] = jnp.zeros((W, B), jnp.int32)

    st0 = dict(
        beg=jnp.zeros((1, B), jnp.int32),
        end=qlen.astype(jnp.int32),
        mx=h0.astype(jnp.int32),
        max_i=jnp.full((1, B), -1, jnp.int32),
        max_j=jnp.full((1, B), -1, jnp.int32),
        max_ie=jnp.full((1, B), -1, jnp.int32),
        gsc=jnp.full((1, B), -1, jnp.int32),
        max_off=jnp.zeros((1, B), jnp.int32),
        # int32, not bool: i1 vectors do not legalize as scf.for carries
        done=jnp.zeros((1, B), jnp.int32),
    )

    def row(i, st):
        active = (st["done"] == 0) & (i < tlen)
        beg_i = jnp.maximum(st["beg"], i - w_eff)            # (1, B)
        end_i = jnp.minimum(jnp.minimum(st["end"], i + w_eff + 1), qlen)
        inband = (jj >= beg_i) & (jj < end_i)

        # dynamic DP-row load: sublane slice of the (T, B) target block,
        # one-hot select over the 5 score planes (no gathers in Mosaic)
        tci = jnp.clip(t_ref[pl.ds(i, 1), :], 0, 4)          # (1, B)
        scores = qp_ref[0]                                   # (W, B)
        for c in range(1, 5):
            scores = jnp.where(tci == c, qp_ref[c], scores)

        ehh = ehh_ref[:]
        ehe = ehe_ref[:]
        M = jnp.where(ehh != 0, ehh + scores, 0)
        E = ehe
        h_pre = jnp.maximum(M, E)

        t_ins = jnp.maximum(M - oe_ins, 0)
        u = jnp.where(inband, t_ins + jj * e_ins, NEG_BIG)
        cm = _scan_max(u, W)
        cm_prev = jnp.pad(cm[:-1, :], ((1, 0), (0, 0)),
                          constant_values=NEG_BIG)
        f = jnp.where(jj == beg_i, 0, cm_prev - (jj - 1) * e_ins)
        f = jnp.maximum(f, 0)

        H = jnp.where(inband, jnp.maximum(h_pre, f), 0)
        e_next = jnp.maximum(E - e_del, jnp.maximum(M - (o_del + e_del), 0))

        h1_init = jnp.where(
            beg_i == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
        ).astype(jnp.int32)

        mrow = jnp.max(H, axis=0, keepdims=True)             # (1, B)
        is_max = inband & (H == mrow)
        mj = jnp.max(jnp.where(is_max, jj, -1), axis=0, keepdims=True)

        Hshift = jnp.pad(H[:-1, :], ((1, 0), (0, 0)))
        sel_mid = (jj >= beg_i + 1) & (jj <= end_i)
        ehh_new = jnp.where(sel_mid, Hshift, ehh)
        ehh_new = jnp.where(jj == beg_i, h1_init, ehh_new)
        ehe_new = jnp.where(inband, e_next, ehe)
        ehe_new = jnp.where(jj == end_i, 0, ehe_new)

        # H[end_i-1] without a gather: masked max (exactly one lane row hits)
        h_at_end = jnp.max(
            jnp.where(jj == jnp.maximum(end_i - 1, 0), H, NEG_BIG),
            axis=0, keepdims=True)
        h_end = jnp.where(end_i > beg_i, h_at_end, h1_init)
        upd_g = active & (end_i == qlen) & (st["gsc"] <= h_end)
        max_ie = jnp.where(upd_g, i, st["max_ie"])
        gsc = jnp.where(upd_g, h_end, st["gsc"])

        break0 = mrow == 0
        improved = mrow > st["mx"]
        di = (i - st["max_i"]) - (mj - st["max_j"])
        zval = jnp.where(
            di > 0,
            st["mx"] - mrow - di * e_del,
            st["mx"] - mrow + di * e_ins,
        )
        breakz = (~improved) & (zdrop > 0) & (zval > zdrop)

        upd_m = active & improved
        off = jnp.abs(mj - i)
        mx = jnp.where(upd_m, mrow, st["mx"])
        max_i = jnp.where(upd_m, i, st["max_i"])
        max_j = jnp.where(upd_m, mj, st["max_j"])
        max_off = jnp.where(upd_m, jnp.maximum(st["max_off"], off),
                            st["max_off"])

        terminated = active & (break0 | breakz)
        done_b = (st["done"] != 0) | terminated | ((i + 1) >= tlen)
        done = done_b.astype(jnp.int32)

        nz = (ehh_new != 0) | (ehe_new != 0)
        in_lo = (jj >= beg_i) & (jj < end_i)
        first_nz = jnp.min(jnp.where(in_lo & nz, jj, jnp.int32(1 << 28)),
                           axis=0, keepdims=True)
        beg_new = jnp.minimum(first_nz, end_i)
        in_hi = (jj >= beg_new) & (jj <= end_i)
        last_nz = jnp.max(jnp.where(in_hi & nz, jj, beg_new - 1),
                          axis=0, keepdims=True)
        end_new = jnp.minimum(last_nz + 2, qlen)

        keep = active & (~terminated)
        ehh_ref[:] = jnp.where(keep, ehh_new, ehh)
        ehe_ref[:] = jnp.where(keep, ehe_new, ehe)
        return dict(
            beg=jnp.where(keep, beg_new, st["beg"]),
            end=jnp.where(keep, end_new, st["end"]),
            mx=jnp.where(active, mx, st["mx"]),
            max_i=jnp.where(active, max_i, st["max_i"]),
            max_j=jnp.where(active, max_j, st["max_j"]),
            max_ie=max_ie, gsc=gsc,
            max_off=jnp.where(active, max_off, st["max_off"]),
            done=done,
        )

    st = jax.lax.fori_loop(0, T, row, st0)
    score_ref[:] = st["mx"]
    qle_ref[:] = st["max_j"] + 1
    tle_ref[:] = st["max_i"] + 1
    gtle_ref[:] = st["max_ie"] + 1
    gsc_ref[:] = st["gsc"]
    moff_ref[:] = st["max_off"]


@functools.partial(
    jax.jit,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "end_bonus",
                     "zdrop", "interpret", "bt"),
)
def banded_sw_extend_batch_pallas(
    q_codes, t_codes, qlen, tlen, h0, ws, mat,
    o_del: int, e_del: int, o_ins: int, e_ins: int,
    end_bonus: int, zdrop: int, interpret: bool = False, bt: int = 128,
):
    """Drop-in equivalent of banded_sw_extend_batch (same result contract)."""
    B0, Q = q_codes.shape
    T = t_codes.shape[1]
    W = max(128, -(-(Q + 2) // 128) * 128)  # padded query/band extent
    BT = min(bt, max(8, B0))
    B = -(-B0 // BT) * BT  # pad batch to the tile multiple
    q_codes = q_codes.astype(jnp.int32)
    t_codes = t_codes.astype(jnp.int32)
    mat = mat.astype(jnp.int32)

    # per-pair band clamp (reference: bandedSWA.cpp:149-157)
    mx_sc = jnp.max(mat)
    max_ins = ((qlen * mx_sc + end_bonus - o_ins).astype(jnp.float32)
               / e_ins + 1.0).astype(jnp.int32)
    max_del = ((qlen * mx_sc + end_bonus - o_del).astype(jnp.float32)
               / e_del + 1.0).astype(jnp.int32)
    w_eff = jnp.minimum(jnp.minimum(ws, jnp.maximum(max_ins, 1)),
                        jnp.maximum(max_del, 1))

    # transposed score profile qp[c, j, b] = mat[c, q[b, j]]
    qp = jnp.take_along_axis(
        jnp.broadcast_to(mat[None, :, :], (B0, 5, 5)),
        jnp.clip(q_codes, 0, 4)[:, None, :], axis=2)   # (B0, 5, Q)
    qp = jnp.pad(qp, ((0, B - B0), (0, 0), (0, W - Q)))
    qp = jnp.transpose(qp, (1, 2, 0))                  # (5, W, B)
    t_pad = jnp.pad(t_codes, ((0, B - B0), (0, 0))).T  # (T, B)
    par = jnp.stack([qlen.astype(jnp.int32), tlen.astype(jnp.int32),
                     h0.astype(jnp.int32), w_eff.astype(jnp.int32)], axis=0)
    par = jnp.pad(par, ((0, 0), (0, B - B0)))          # (4, B)

    kern = functools.partial(
        _kernel, T=T, W=W, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, end_bonus=end_bonus, zdrop=zdrop)
    grid = (B // BT,)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 6,
        in_specs=[
            pl.BlockSpec((5, W, BT), lambda g: (0, 0, g)),   # qp
            pl.BlockSpec((T, BT), lambda g: (0, g)),         # t codes (T, B)
            pl.BlockSpec((4, BT), lambda g: (0, g)),         # par
        ],
        out_specs=[pl.BlockSpec((1, BT), lambda g: (0, g))] * 6,
        scratch_shapes=[
            pltpu.VMEM((W, BT), jnp.int32),  # ehh
            pltpu.VMEM((W, BT), jnp.int32),  # ehe
        ],
        interpret=interpret,
    )(qp, t_pad, par)
    keys = ("score", "qle", "tle", "gtle", "gscore", "max_off")
    return {k: v[0, :B0] for k, v in zip(keys, outs)}
