"""Batched banded Smith-Waterman seed extension for TPU.

Bit-exact batched reimplementation of the scalarBandedSWA contract
(reference: src/bandedSWA.cpp:116-238 = bwa's ksw_extend2), replacing the
reference's AVX-512 lane-parallel kernels (smithWaterman512_8/16,
src/bandedSWA.cpp:2263-3380) with a TPU-native formulation:

* batch dimension in sublanes, query positions in lanes — each row of the DP
  is one fused VPU sweep over (B, Q);
* the in-row F (insertion) dependence is an associative "decaying prefix max"
  — the reference semantics open gaps only off the match score M, so
  F_{j+1} = max(F_j - e_ins, max(M_j - oe_ins, 0)) is a cummax after the
  affine transform u_j = t_j + j*e_ins;
* adaptive begin/end band pruning, z-dropoff, and row-zero termination are
  carried as per-element masked state, preserving the reference's exact
  (result-affecting) early-exit behavior;
* everything is fixed-shape: pairs are bucketed to (Q, T) tiles by the
  caller, mirroring the 8-bit/16-bit/scalar class split of the reference
  (src/bwamem.cpp:2804-2812).

The kernel returns {score, qle, tle, gtle, gscore, max_off} exactly as the
scalar contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_BIG = jnp.int32(-(1 << 28))


@functools.partial(
    jax.jit,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "end_bonus", "zdrop"),
)
def banded_sw_extend_batch(
    q_codes: jax.Array,   # (B, Q) int32 query codes 0..4
    t_codes: jax.Array,   # (B, T) int32 target codes 0..4
    qlen: jax.Array,      # (B,) int32
    tlen: jax.Array,      # (B,) int32
    h0: jax.Array,        # (B,) int32 initial score
    ws: jax.Array,        # (B,) int32 band width per pair
    mat: jax.Array,       # (5,5) int32 scoring matrix
    o_del: int, e_del: int, o_ins: int, e_ins: int,
    end_bonus: int, zdrop: int,
):
    return _sw_core(q_codes, t_codes, qlen, tlen, h0, ws, mat,
                    o_del, e_del, o_ins, e_ins, end_bonus, zdrop)


import os as _os

# Pallas variant of the DP (ops/banded_sw_pallas.py): VMEM-resident row
# state in one Mosaic kernel instead of an XLA while-loop carry. Default ON
# for real TPU backends — measured +12% end-to-end over the XLA kernel with
# byte-identical SAM on a v5e chip (tools/ab_extend.py, 2026-08). On CPU the
# kernel only runs in (slow) interpret mode, so the XLA kernel stays the
# default there; BWAMEME_PALLAS=0/1 forces either way.
_PALLAS_ENV = _os.environ.get("BWAMEME_PALLAS", "")


def _use_pallas():
    if _PALLAS_ENV in ("0", "1"):
        return _PALLAS_ENV == "1"
    import jax as _jax

    # real chips only (the axon tunnel backend also reports non-cpu);
    # CPU would run the kernel in interpret mode — far slower than XLA
    return _jax.default_backend() != "cpu"


def _sw_core(q_codes, t_codes, qlen, tlen, h0, ws, mat,
             o_del, e_del, o_ins, e_ins, end_bonus, zdrop):
    if _use_pallas():
        import jax as _jax

        from bwameme_tpu.ops.banded_sw_pallas import (
            banded_sw_extend_batch_pallas)

        return banded_sw_extend_batch_pallas(
            q_codes, t_codes, qlen, tlen, h0, ws, mat,
            o_del, e_del, o_ins, e_ins, end_bonus, zdrop,
            interpret=_jax.default_backend() == "cpu")
    return _sw_core_xla(q_codes, t_codes, qlen, tlen, h0, ws, mat,
                        o_del, e_del, o_ins, e_ins, end_bonus, zdrop)


def _sw_core_xla(q_codes, t_codes, qlen, tlen, h0, ws, mat,
                 o_del, e_del, o_ins, e_ins, end_bonus, zdrop):
    B, Q = q_codes.shape
    T = t_codes.shape[1]
    # codes may arrive as int8 to quarter the host->device transfer
    q_codes = q_codes.astype(jnp.int32)
    t_codes = t_codes.astype(jnp.int32)
    W = Q + 2  # eh arrays are indexed 0..qlen (+1 guard)
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    jj = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    qlen_c = qlen[:, None]

    # ---- per-pair band clamp (reference: bandedSWA.cpp:149-157) ----
    mx_sc = jnp.max(mat)
    max_ins = ((qlen * mx_sc + end_bonus - o_ins).astype(jnp.float32) / e_ins + 1.0).astype(jnp.int32)
    max_ins = jnp.maximum(max_ins, 1)
    max_del = ((qlen * mx_sc + end_bonus - o_del).astype(jnp.float32) / e_del + 1.0).astype(jnp.int32)
    max_del = jnp.maximum(max_del, 1)
    w_eff = jnp.minimum(jnp.minimum(ws, max_ins), max_del)

    # ---- first row init (reference: bandedSWA.cpp:143-147) ----
    v = h0[:, None] - oe_ins - (jj - 1) * e_ins
    ehh0 = jnp.where(jj == 0, h0[:, None], jnp.maximum(v, 0))
    ehh0 = jnp.where(jj <= qlen_c, ehh0, 0).astype(jnp.int32)
    ehe0 = jnp.zeros((B, W), jnp.int32)

    # per-row score lookup: scores[b, j] = mat[t_codes[b,i], q_codes[b,j]]
    # precompute mat rows gathered by query codes: prof[b, c, j] = mat[c, q[b,j]]
    prof = mat[:, :][None, :, :]  # (1,5,5)
    qp = jnp.take_along_axis(
        jnp.broadcast_to(prof, (B, 5, 5)),
        jnp.clip(q_codes, 0, 4)[:, None, :].astype(jnp.int32),
        axis=2,
    )  # (B, 5, Q)

    state = dict(
        ehh=ehh0, ehe=ehe0,
        beg=jnp.zeros((B,), jnp.int32),
        end=qlen.astype(jnp.int32),
        mx=h0.astype(jnp.int32),
        max_i=jnp.full((B,), -1, jnp.int32),
        max_j=jnp.full((B,), -1, jnp.int32),
        max_ie=jnp.full((B,), -1, jnp.int32),
        gsc=jnp.full((B,), -1, jnp.int32),
        max_off=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )

    def row(i, st):
        active = (~st["done"]) & (i < tlen)
        beg_i = jnp.maximum(st["beg"], i - w_eff)
        end_i = jnp.minimum(jnp.minimum(st["end"], i + w_eff + 1), qlen)
        begc, endc = beg_i[:, None], end_i[:, None]
        inband = (jj >= begc) & (jj < endc)

        tci = jax.lax.dynamic_index_in_dim(
            t_codes, jnp.minimum(i, T - 1), axis=1, keepdims=False
        )
        scores_q = jnp.take_along_axis(
            qp, jnp.clip(tci, 0, 4)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]  # (B, Q)
        scores = jnp.pad(scores_q, ((0, 0), (0, W - Q)))

        ehh, ehe = st["ehh"], st["ehe"]
        M = jnp.where(ehh != 0, ehh + scores, 0)
        E = ehe
        h_pre = jnp.maximum(M, E)

        # F scan: f_beg = 0; f_{j+1} = max(f_j - e_ins, max(M_j - oe_ins, 0))
        t_ins = jnp.maximum(M - oe_ins, 0)
        u = jnp.where(inband, t_ins + jj * e_ins, NEG_BIG)
        cm = jax.lax.cummax(u, axis=1)
        cm_prev = jnp.concatenate(
            [jnp.full((B, 1), NEG_BIG), cm[:, :-1]], axis=1
        )
        f = jnp.where(jj == begc, 0, cm_prev - (jj - 1) * e_ins)
        f = jnp.maximum(f, 0)

        H = jnp.where(inband, jnp.maximum(h_pre, f), 0)
        e_next = jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0))

        h1_init = jnp.where(
            beg_i == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
        ).astype(jnp.int32)

        # row max and its last attaining column
        mrow = jnp.max(H, axis=1)
        is_max = inband & (H == mrow[:, None])
        mj = jnp.max(jnp.where(is_max, jj, -1), axis=1)

        # shifted state update
        Hshift = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H[:, :-1]], axis=1)
        sel_mid = (jj >= begc + 1) & (jj <= endc)
        ehh_new = jnp.where(sel_mid, Hshift, ehh)
        ehh_new = jnp.where(jj == begc, h1_init[:, None], ehh_new)
        ehe_new = jnp.where(inband, e_next, ehe)
        ehe_new = jnp.where(jj == endc, 0, ehe_new)

        # gscore: h1 after the loop = H(i, end-1)
        h_end = jnp.where(
            end_i > beg_i,
            jnp.take_along_axis(H, jnp.maximum(end_i - 1, 0)[:, None], axis=1)[:, 0],
            h1_init,
        )
        upd_g = active & (end_i == qlen) & (st["gsc"] <= h_end)
        max_ie = jnp.where(upd_g, i, st["max_ie"])
        gsc = jnp.where(upd_g, h_end, st["gsc"])

        # termination + max update
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
        max_off = jnp.where(upd_m, jnp.maximum(st["max_off"], off), st["max_off"])

        terminated = active & (break0 | breakz)
        done = st["done"] | terminated | ((i + 1) >= tlen)

        # band pruning on the new state (reference: bandedSWA.cpp:217-221)
        nz = (ehh_new != 0) | (ehe_new != 0)
        in_lo = (jj >= begc) & (jj < endc)
        first_nz = jnp.min(jnp.where(in_lo & nz, jj, jnp.int32(1 << 28)), axis=1)
        beg_new = jnp.minimum(first_nz, end_i)
        in_hi = (jj >= beg_new[:, None]) & (jj <= endc)
        last_nz = jnp.max(jnp.where(in_hi & nz, jj, beg_new[:, None] - 1), axis=1)
        end_new = jnp.minimum(last_nz + 2, qlen)

        keep = active & (~terminated)
        sel = keep[:, None]
        return dict(
            ehh=jnp.where(sel, ehh_new, ehh),
            ehe=jnp.where(sel, ehe_new, ehe),
            beg=jnp.where(keep, beg_new, st["beg"]),
            end=jnp.where(keep, end_new, st["end"]),
            mx=jnp.where(active, mx, st["mx"]),
            max_i=jnp.where(active, max_i, st["max_i"]),
            max_j=jnp.where(active, max_j, st["max_j"]),
            max_ie=max_ie, gsc=gsc,
            max_off=jnp.where(active, max_off, st["max_off"]),
            done=done,
        )

    # unroll: halves the device loop-iteration overhead of the ~T sequential
    # rows (each row is cheap VPU work; the while-loop bookkeeping is a
    # measurable fraction). Kept modest — the axon remote compiler's cost
    # grows with program size.
    st = jax.lax.fori_loop(0, T, row, state, unroll=2)
    return dict(
        score=st["mx"], qle=st["max_j"] + 1, tle=st["max_i"] + 1,
        gtle=st["max_ie"] + 1, gscore=st["gsc"], max_off=st["max_off"],
    )


# ---------------------------------------------------------------------------
# Fused coordinate-based extension: the whole of mem_chain2aln's SW work —
# left and right extensions of every seed, *including* the MAX_BAND_TRY=2
# band-doubling retry (reference: src/bwamem.cpp:2968-3022) — as ONE device
# dispatch. The host ships only per-job coordinates; query codes come from a
# small (R, L) batch matrix and target codes are decoded on device from the
# 2-bit packed reference text (text32), so no sequence bytes cross the
# host<->device link. Band retries run speculatively (each job computes both
# w and 2w in doubled lanes; the retry predicate selects per lane), trading
# cheap VPU compute for dispatch round-trips.
#
# Positions are int32 — single-chip indexes up to 2^31 bases (text+RC); the
# multi-host sharded layer owns larger genomes.


def _decode_text(text32: jax.Array, start, ln, reverse: bool, T: int):
    """(N, T) int32 codes of text[start : start+ln], optionally reversed;
    positions >= ln yield 0. HBM traffic is one WORD gather per 16 bases
    (consecutive words per lane), the per-base extraction then runs on the
    unpacked in-register matrix — random-gathering every base individually
    costs ~16x more HBM transactions."""
    N = start.shape[0]
    Wt = T // 16 + 2
    s_nn = jnp.maximum(start, 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (N, Wt), 1)
    words = jnp.take(text32, (s_nn >> 4)[:, None] + wj, mode="clip")
    sh = (jnp.uint32(15) - jnp.arange(16, dtype=jnp.uint32)) * jnp.uint32(2)
    bases = ((words[:, :, None] >> sh[None, None, :]) & jnp.uint32(3))
    flat = bases.astype(jnp.int8).reshape(N, Wt * 16)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)
    rel = (ln[:, None] - 1 - jj) if reverse else jj
    idx = jnp.clip((s_nn & 15)[:, None] + rel, 0, Wt * 16 - 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return jnp.where(jj < ln[:, None], out.astype(jnp.int32), 0)


def _gather_query(codes: jax.Array, row, start, ln, reverse: bool, Q: int):
    """(N, Q) int32 query codes from the (R, L) batch code matrix: one ROW
    gather per lane (contiguous), then in-row indexing."""
    R, L = codes.shape
    N = row.shape[0]
    rows = jnp.take(codes, jnp.clip(row, 0, R - 1), axis=0)  # (N, L)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)
    rel = (ln[:, None] - 1 - jj) if reverse else jj
    idx = jnp.clip(start[:, None] + rel, 0, L - 1)
    q = jnp.take_along_axis(rows, idx, axis=1)
    return jnp.where(jj < ln[:, None], q.astype(jnp.int32), 0)


def _retry_select(res1, res2, w1, w2, prev):
    """Apply the band-doubling retry rule per lane: round 2 replaces round 1
    iff round 1 changed the score (prev = the alnreg score entering the
    round: -1 on the left side, the post-left score on the right side) AND
    its max_off reached the band threshold."""
    use2 = (res1["score"] != prev) & (
        res1["max_off"] >= ((w1 >> 1) + (w1 >> 2)))
    out = {k: jnp.where(use2, res2[k], res1[k]) for k in res1}
    out["w_used"] = jnp.where(use2, w2, w1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "pen_clip5",
                     "pen_clip3", "zdrop", "w0", "Q", "TL", "TR"),
)
def fused_extend_coord(
    text32: jax.Array,     # uint32[] packed reference text (+RC)
    codes: jax.Array,      # (R, L) int8/uint8 nt4 read codes (N=4 preserved)
    mat: jax.Array,        # (5,5) int32
    reg_h0seed: jax.Array,  # (G,) int32: seed_len * a per alnreg
    l_reg: jax.Array, l_row: jax.Array, l_qlen: jax.Array,
    l_tstart: jax.Array, l_tlen: jax.Array,      # (NL,) left jobs
    r_reg: jax.Array, r_row: jax.Array, r_qstart: jax.Array,
    r_qlen: jax.Array, r_tstart: jax.Array, r_tlen: jax.Array,  # (NR,)
    o_del: int, e_del: int, o_ins: int, e_ins: int,
    pen_clip5: int, pen_clip3: int, zdrop: int, w0: int,
    Q: int, TL: int, TR: int,
):
    G = reg_h0seed.shape[0]
    codes = codes.astype(jnp.int32)

    def run_side(reg, qmat, tmat, qlen, tlen, h0, end_bonus, prev):
        N = qlen.shape[0]
        q2 = jnp.concatenate([qmat, qmat])
        t2 = jnp.concatenate([tmat, tmat])
        ql2 = jnp.concatenate([qlen, qlen])
        tl2 = jnp.concatenate([tlen, tlen])
        h2 = jnp.concatenate([h0, h0])
        ws2 = jnp.concatenate([
            jnp.full((N,), w0, jnp.int32), jnp.full((N,), w0 * 2, jnp.int32)])
        res = _sw_core(q2, t2, ql2, tl2, h2, ws2, mat,
                       o_del, e_del, o_ins, e_ins, end_bonus, zdrop)
        r1 = {k: v[:N] for k, v in res.items()}
        r2 = {k: v[N:] for k, v in res.items()}
        return _retry_select(r1, r2, jnp.int32(w0), jnp.int32(w0 * 2), prev)

    # ---- left (query/target reversed; end bonus = 5' clip penalty) ----
    lq = _gather_query(codes, l_row, jnp.zeros_like(l_qlen), l_qlen, True, Q)
    lt = _decode_text(text32, l_tstart, l_tlen, True, TL)
    h0l = jnp.take(reg_h0seed, l_reg, mode="clip")
    left = run_side(l_reg, lq, lt, l_qlen, l_tlen, h0l, pen_clip5,
                    jnp.full(l_reg.shape, -1, jnp.int32))

    # score after left extension per alnreg (a.score = r.score; regs with no
    # left job keep their seed score) — feeds the right-side h0
    score_reg = reg_h0seed.at[l_reg].set(left["score"], mode="drop")

    # ---- right ----
    rq = _gather_query(codes, r_row, r_qstart, r_qlen, False, Q)
    rt = _decode_text(text32, r_tstart, r_tlen, False, TR)
    h0r = jnp.take(score_reg, r_reg, mode="clip")
    right = run_side(r_reg, rq, rt, r_qlen, r_tlen, h0r, pen_clip3, h0r)

    # ONE stacked array per side: each np.asarray on the host costs a
    # link round-trip, so 14 small transfers would dominate the wall time
    return (jnp.stack([left[k] for k in EXT_RESULT_ORDER]),
            jnp.stack([right[k] for k in EXT_RESULT_ORDER]))


EXT_RESULT_ORDER = ("score", "qle", "tle", "gtle", "gscore", "max_off",
                    "w_used")

# single-round kernel result rows (adds the h0 each lane actually used, so
# the host can evaluate the retry predicate for the right side)
EXT_ROUND_ORDER = ("score", "qle", "tle", "gtle", "gscore", "max_off",
                   "w_used", "h0")


@functools.partial(
    jax.jit,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "pen_clip5",
                     "pen_clip3", "zdrop", "NL", "NR", "Q", "TL", "TR"),
)
def fused_extend_round(
    text32: jax.Array, codes: jax.Array, mat: jax.Array,
    reg_h0: jax.Array,
    jobs: jax.Array,  # (13, P) int32: ONE upload for all job coordinates —
    #                   rows 0-5 = left (reg,row,qlen,tstart,tlen,ws) padded
    #                   to P, rows 6-12 = right (reg,row,qstart,qlen,tstart,
    #                   tlen,ws); sliced to the NL/NR lane buckets on device
    o_del: int, e_del: int, o_ins: int, e_ins: int,
    pen_clip5: int, pen_clip3: int, zdrop: int,
    NL: int, NR: int, Q: int, TL: int, TR: int,
):
    """ONE extension round per side, per-lane band widths — the
    non-speculative production kernel. Band retries are so rare (<0.1% of
    jobs on real reads) that running the doubled-width round speculatively
    for every lane costs more than redispatching the few retried jobs; the
    host evaluates the retry predicate from the returned (max_off, h0) and
    issues a small follow-up round only when needed (the ladder in
    align/extend.py:extend_flat_finish). Right-side h0 chains from this
    round's left scores on device, exactly as the reference computes it
    between its left and right round-1 passes."""
    codes = codes.astype(jnp.int32)
    l_reg, l_row, l_qlen, l_tstart, l_tlen, l_ws = (
        jobs[i, :NL] for i in range(6))
    r_reg, r_row, r_qstart, r_qlen, r_tstart, r_tlen, r_ws = (
        jobs[i, :NR] for i in range(6, 13))
    lq = _gather_query(codes, l_row, jnp.zeros_like(l_qlen), l_qlen, True, Q)
    lt = _decode_text(text32, l_tstart, l_tlen, True, TL)
    h0l = jnp.take(reg_h0, l_reg, mode="clip")
    lres = _sw_core(lq, lt, l_qlen, l_tlen, h0l, l_ws, mat,
                    o_del, e_del, o_ins, e_ins, pen_clip5, zdrop)
    score_reg = reg_h0.at[l_reg].set(lres["score"], mode="drop")
    rq = _gather_query(codes, r_row, r_qstart, r_qlen, False, Q)
    rt = _decode_text(text32, r_tstart, r_tlen, False, TR)
    h0r = jnp.take(score_reg, r_reg, mode="clip")
    rres = _sw_core(rq, rt, r_qlen, r_tlen, h0r, r_ws, mat,
                    o_del, e_del, o_ins, e_ins, pen_clip3, zdrop)

    def stk(r, ws, h0):
        return jnp.stack([r["score"], r["qle"], r["tle"], r["gtle"],
                          r["gscore"], r["max_off"], ws, h0])

    return stk(lres, l_ws, h0l), stk(rres, r_ws, h0r)


@functools.partial(
    jax.jit,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "end_bonus",
                     "zdrop", "reverse", "N", "Q", "T"),
)
def extend_side_round(
    text32: jax.Array, codes: jax.Array, mat: jax.Array,
    score_reg: jax.Array,   # (Gp,) int32 per-alnreg h0 source
    jobs: jax.Array,        # (7, P) int32: reg,row,qstart,qlen,tstart,tlen,ws
    o_del: int, e_del: int, o_ins: int, e_ins: int,
    end_bonus: int, zdrop: int, reverse: bool, N: int, Q: int, T: int,
):
    """ONE side, ONE (Q, T) tile class. The whole-batch single dispatch
    (fused_extend_round) pads every job to the batch-max tile; extension
    jobs are wildly non-uniform (a seed covering most of the read leaves
    a few-base extension, while a chain edge can need qlen+w rows), so the
    production path sorts jobs by target length and dispatches per tile
    class — the TPU analog of the reference's lane-occupancy length sort
    (src/bandedSWA.cpp:1909 sortPairsLen + the 8/16-bit class split at
    src/bwamem.cpp:2804-2812). h0 is gathered per job from score_reg so
    right-side rounds chain from the left scores entirely on device."""
    codes = codes.astype(jnp.int32)
    reg, row, qstart, qlen, tstart, tlen, ws = (jobs[i, :N]
                                                for i in range(7))
    q = _gather_query(codes, row, qstart, qlen, reverse, Q)
    t = _decode_text(text32, tstart, tlen, reverse, T)
    h0 = jnp.take(score_reg, reg, mode="clip")
    res = _sw_core(q, t, qlen, tlen, h0, ws, mat,
                   o_del, e_del, o_ins, e_ins, end_bonus, zdrop)
    return jnp.stack([res["score"], res["qle"], res["tle"], res["gtle"],
                      res["gscore"], res["max_off"], ws, h0])


@jax.jit
def scatter_scores(score_reg: jax.Array, reg_idx: jax.Array,
                   scores: jax.Array):
    """score_reg[reg_idx] = scores (pad lanes carry an out-of-range index
    and are dropped) — folds a left bucket's scores into the per-alnreg
    score table the right-side rounds draw h0 from."""
    return score_reg.at[reg_idx].set(scores, mode="drop")


def extend_pairs_np(pairs, mat, o_del, e_del, o_ins, e_ins, end_bonus, zdrop,
                    q_tile=128, t_tile=256):
    """Convenience host wrapper: run a list of (query, target, h0, w) pairs
    through the batched kernel with padding, returning numpy dicts."""
    B = len(pairs)
    if B == 0:
        return []
    Q = max(max(len(p[0]) for p in pairs), 1)
    T = max(max(len(p[1]) for p in pairs), 1)
    q = np.full((B, Q), 0, dtype=np.int32)
    t = np.full((B, T), 0, dtype=np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = np.zeros(B, np.int32)
    ws = np.zeros(B, np.int32)
    for b, (qq, tt, hh, w) in enumerate(pairs):
        q[b, : len(qq)] = qq
        t[b, : len(tt)] = tt
        qlen[b], tlen[b], h0[b], ws[b] = len(qq), len(tt), hh, w
    out = banded_sw_extend_batch(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen),
        jnp.asarray(h0), jnp.asarray(ws), jnp.asarray(mat.astype(np.int32)),
        o_del, e_del, o_ins, e_ins, end_bonus, zdrop,
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    return [
        {k: int(out[k][b]) for k in out} for b in range(B)
    ]
