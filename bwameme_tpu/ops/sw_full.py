"""Batched full (unbanded) Smith-Waterman for paired-end mate rescue.

TPU-native replacement for the reference's kswv class (reference:
src/kswv.cpp, src/ksw.cpp:113-349) — the batched striped-SW engine used by
mem_sam_pe_batch for mate rescue. Layout matches ops/banded_sw.py: pair batch
in sublanes, query positions in lanes; the in-row F chain is an exact
decaying prefix max (the closed form of Farrar's lazy-F fixpoint).

Per pair returns the kswr_t contract {score, te, qe, score2, te2} plus an
optional reverse pass for {tb, qb} (the KSW_XSTART semantics of ksw_align2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_BIG = jnp.int32(-(1 << 28))


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins"))
def full_sw_batch(
    q_codes: jax.Array,  # (B, Q) int32
    t_codes: jax.Array,  # (B, T) int32
    qlen: jax.Array,     # (B,)
    tlen: jax.Array,     # (B,)
    mat: jax.Array,      # (5,5) int32
    min_sc: jax.Array,   # (B,) XSUBO threshold for score2 rows
    o_del: int, e_del: int, o_ins: int, e_ins: int,
):
    B, Q = q_codes.shape
    T = t_codes.shape[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
    qmask = jj < qlen[:, None]

    prof = jnp.broadcast_to(mat[None, :, :], (B, 5, 5))
    qp = jnp.take_along_axis(
        prof, jnp.clip(q_codes, 0, 4)[:, None, :].astype(jnp.int32), axis=2
    )  # (B,5,Q)

    state = dict(
        hprev=jnp.zeros((B, Q), jnp.int32),   # H(i-1, j)
        e=jnp.zeros((B, Q), jnp.int32),       # E(i, j)
        gmax=jnp.zeros((B,), jnp.int32),
        te=jnp.full((B,), -1, jnp.int32),
        qe=jnp.full((B,), -1, jnp.int32),
        rowmax=jnp.zeros((B, T), jnp.int32),
    )

    def row(i, st):
        active = i < tlen
        tci = jax.lax.dynamic_index_in_dim(t_codes, jnp.minimum(i, T - 1),
                                           axis=1, keepdims=False)
        scores = jnp.take_along_axis(
            qp, jnp.clip(tci, 0, 4)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]
        hdiag = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), st["hprev"][:, :-1]], axis=1
        )
        M = hdiag + scores
        E = st["e"]
        hpre = jnp.maximum(jnp.maximum(M, E), 0)
        hpre = jnp.where(qmask, hpre, 0)
        # F fixpoint: f_{j+1} = max(f_j - e_ins, max(hpre_j - oe_ins, 0))
        t_ins = jnp.maximum(hpre - oe_ins, 0)
        u = jnp.where(qmask, t_ins + jj * e_ins, NEG_BIG)
        cm = jax.lax.cummax(u, axis=1)
        cm_prev = jnp.concatenate([jnp.full((B, 1), NEG_BIG), cm[:, :-1]], axis=1)
        f = jnp.maximum(cm_prev - (jj - 1) * e_ins, 0)
        f = jnp.where(jj == 0, 0, f)
        H = jnp.where(qmask, jnp.maximum(hpre, f), 0)
        e_next = jnp.maximum(jnp.maximum(E - e_del, 0),
                             jnp.maximum(H - oe_del, 0))
        rmax = jnp.max(H, axis=1)
        # qe: smallest column attaining the row max (only updated on new gmax)
        is_rm = qmask & (H == rmax[:, None])
        first_col = jnp.min(jnp.where(is_rm, jj, Q + 1), axis=1)
        improved = active & (rmax > st["gmax"])
        rowmax = st["rowmax"].at[:, jnp.minimum(i, T - 1)].set(
            jnp.where(active, rmax, 0)
        )
        sel = active[:, None]
        return dict(
            hprev=jnp.where(sel, H, st["hprev"]),
            e=jnp.where(sel, e_next, st["e"]),
            gmax=jnp.where(improved, rmax, st["gmax"]),
            te=jnp.where(improved, i, st["te"]),
            qe=jnp.where(improved, first_col, st["qe"]),
            rowmax=rowmax,
        )

    st = jax.lax.fori_loop(0, T, row, state)

    # score2/te2: best row max >= min_sc outside te +/- ceil(gmax/max_match)
    mx = jnp.max(mat)
    rad = (st["gmax"] + mx - 1) // jnp.maximum(mx, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    outside = (ii < (st["te"] - rad)[:, None]) | (ii > (st["te"] + rad)[:, None])
    valid = outside & (ii < tlen[:, None]) & (st["rowmax"] >= min_sc[:, None])
    cand = jnp.where(valid, st["rowmax"], 0)
    score2 = jnp.max(cand, axis=1)
    te2 = jnp.where(
        score2 > 0,
        jnp.argmax(cand, axis=1).astype(jnp.int32),
        jnp.int32(-1),
    )
    return dict(score=st["gmax"], te=st["te"], qe=st["qe"],
                score2=score2, te2=te2)


def align_batch(pairs, mat, o_del, e_del, o_ins, e_ins, min_sc=0,
                with_start=True):
    """Host wrapper: list of (query, target) code arrays -> list of dicts
    {score, te, qe, score2, te2, tb, qb} (ksw_align2 contract)."""
    B = len(pairs)
    if B == 0:
        return []

    def bucket(x):
        for b in (64, 128, 256, 512, 1024, 2048, 4096):
            if x <= b:
                return b
        return x

    Q = bucket(max(len(p[0]) for p in pairs))
    T = bucket(max(len(p[1]) for p in pairs))
    Bb = ((B + 63) // 64) * 64
    q = np.zeros((Bb, Q), np.int32)
    t = np.zeros((Bb, T), np.int32)
    qlen = np.zeros(Bb, np.int32)
    tlen = np.zeros(Bb, np.int32)
    for b, (qq, tt) in enumerate(pairs):
        q[b, : len(qq)] = np.minimum(qq, 4)
        t[b, : len(tt)] = np.minimum(tt, 4)
        qlen[b], tlen[b] = len(qq), len(tt)
    ms = np.full(Bb, min_sc, np.int32)
    fwd = full_sw_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
                        jnp.asarray(tlen), jnp.asarray(mat.astype(np.int32)),
                        jnp.asarray(ms), o_del, e_del, o_ins, e_ins)
    fwd = {k: np.asarray(v) for k, v in fwd.items()}
    out = [
        dict(score=int(fwd["score"][b]), te=int(fwd["te"][b]),
             qe=int(fwd["qe"][b]), score2=int(fwd["score2"][b]),
             te2=int(fwd["te2"][b]), tb=-1, qb=-1)
        for b in range(B)
    ]
    if not with_start:
        return out
    # reverse pass on the best-hit prefixes
    rq = np.zeros((Bb, Q), np.int32)
    rt = np.zeros((Bb, T), np.int32)
    rqlen = np.zeros(Bb, np.int32)
    rtlen = np.zeros(Bb, np.int32)
    for b, (qq, tt) in enumerate(pairs):
        if out[b]["score"] <= 0:
            continue
        nq = out[b]["qe"] + 1
        nt = out[b]["te"] + 1
        rq[b, :nq] = np.minimum(qq[:nq][::-1], 4)
        rt[b, :nt] = np.minimum(tt[:nt][::-1], 4)
        rqlen[b], rtlen[b] = nq, nt
    rev = full_sw_batch(jnp.asarray(rq), jnp.asarray(rt), jnp.asarray(rqlen),
                        jnp.asarray(rtlen), jnp.asarray(mat.astype(np.int32)),
                        jnp.asarray(ms), o_del, e_del, o_ins, e_ins)
    rev = {k: np.asarray(v) for k, v in rev.items()}
    for b in range(B):
        if out[b]["score"] > 0:
            out[b]["tb"] = out[b]["te"] - int(rev["te"][b])
            out[b]["qb"] = out[b]["qe"] - int(rev["qe"][b])
    return out
