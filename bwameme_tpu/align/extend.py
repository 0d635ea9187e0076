"""Chain -> alignment-region extension via the batched banded-SW kernel.

Replicates mem_chain2aln_across_reads_V2 (reference: src/bwamem.cpp:2573-3489):
per kept chain, compute the reference window (rmax), build left (reversed) and
right extension pairs for every seed in descending score order, run them
through the batched TPU banded-SW kernel with the MAX_BAND_TRY=2 band-doubling
retry rule, fold scores into mem_alnreg fields (gscore/clip decision,
truesc accounting, seedcov), then apply the post-hoc contained-seed purge
(src/bwamem.cpp:3390-3489).

The SW work from all reads of a batch is flattened into one kernel invocation
per (band-try) round — the TPU analog of the reference's SIMD-lane batching
(sortPairsLenExt + 8/16-bit class split, src/bwamem.cpp:2804-2812).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from bwameme_tpu.align.chain import Chain, Seed, cal_max_gap, clamp_to_contig
from bwameme_tpu.ops.banded_sw import banded_sw_extend_batch

MAX_BAND_TRY = 2
H0_SENTINEL = -99  # reference: src/macro.h:44 H0_


@dataclasses.dataclass
class AlnReg:
    rb: int = H0_SENTINEL
    re: int = H0_SENTINEL
    qb: int = H0_SENTINEL
    qe: int = H0_SENTINEL
    rid: int = -1
    score: int = -1
    truesc: int = -1
    sub: int = 0
    csub: int = 0
    sub_n: int = 0
    alt_sc: int = 0
    w: int = 0
    seedcov: int = 0
    secondary: int = -1
    secondary_all: int = -1
    hash: int = 0
    frac_rep: float = 0.0
    is_alt: bool = False
    seedlen0: int = 0
    n_comp: int = 1
    chain: Chain | None = None


def _seedcov(a: AlnReg) -> int:
    cov = 0
    for t in a.chain.seeds:
        if (t.qbeg >= a.qb and t.qbeg + t.len <= a.qe
                and t.rbeg >= a.rb and t.rbeg + t.len <= a.re):
            cov += t.len
    return cov


@dataclasses.dataclass
class _Pair:
    query: np.ndarray
    ref: np.ndarray
    h0: int
    read_i: int
    reg_i: int


def _run_round(pairs: list[_Pair], opt, w: int, end_bonus: int):
    """Run one band-try round through the batched kernel."""
    if not pairs:
        return []
    B = len(pairs)
    Q = max(1, max(len(p.query) for p in pairs))
    T = max(1, max(len(p.ref) for p in pairs))
    # pad to fixed buckets to limit recompilation
    def bucket(x):
        for b in (64, 128, 256, 512, 1024, 2048):
            if x <= b:
                return b
        return x
    Q, T = bucket(Q), bucket(T)
    Bb = ((B + 63) // 64) * 64
    q = np.zeros((Bb, Q), np.int8)
    t = np.zeros((Bb, T), np.int8)
    qlen = np.zeros(Bb, np.int32)
    tlen = np.zeros(Bb, np.int32)
    h0 = np.ones(Bb, np.int32)
    for b, p in enumerate(pairs):
        q[b, : len(p.query)] = p.query
        t[b, : len(p.ref)] = p.ref
        qlen[b], tlen[b], h0[b] = len(p.query), len(p.ref), p.h0
    ws = np.full(Bb, w, np.int32)
    out = banded_sw_extend_batch(
        q, t, qlen, tlen, h0, ws, opt.mat.astype(np.int32),
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, end_bonus, opt.zdrop,
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    return [{k: int(out[k][b]) for k in out} for b in range(B)]


def extend_chains_batch(opt, bns, text: np.ndarray, queries: list[np.ndarray],
                        chains_per_read: list[list[Chain]]) -> list[list[AlnReg]]:
    """Extension for a batch of reads. Returns alnregs per read (pre-dedup)."""
    l_pac = bns.l_pac
    regs_per_read: list[list[AlnReg]] = [[] for _ in queries]
    left_pairs: list[_Pair] = []
    right_pairs: list[_Pair] = []
    rseqs = {}
    srt_per_chain: dict[tuple[int, int], list[int]] = {}

    for li, (query, chains) in enumerate(zip(queries, chains_per_read)):
        l_query = len(query)
        av = regs_per_read[li]
        for cj, c in enumerate(chains):
            if not c.seeds:
                continue
            # reference window (reference: src/bwamem.cpp:2649-2680)
            rmax0, rmax1 = l_pac << 1, 0
            for t in c.seeds:
                b = t.rbeg - (t.qbeg + cal_max_gap(opt, t.qbeg))
                e = t.rbeg + t.len + (
                    (l_query - t.qbeg - t.len)
                    + cal_max_gap(opt, l_query - t.qbeg - t.len)
                )
                rmax0 = min(rmax0, b)
                rmax1 = max(rmax1, e)
            rmax0 = max(rmax0, 0)
            rmax1 = min(rmax1, l_pac << 1)
            if rmax0 < l_pac < rmax1:
                if c.seeds[0].rbeg < l_pac:
                    rmax1 = l_pac
                else:
                    rmax0 = l_pac
            rmax0, rmax1, rid = clamp_to_contig(bns, rmax0, c.seeds[0].rbeg, rmax1)
            assert rid == c.rid
            rseq = text[rmax0:rmax1]
            rseqs[(li, cj)] = (rmax0, rmax1)

            # seeds in ascending (score, index); process descending
            srt = sorted(range(len(c.seeds)),
                         key=lambda i: (c.seeds[i].score, i))
            srt_per_chain[(li, cj)] = srt
            for k in range(len(c.seeds) - 1, -1, -1):
                s = c.seeds[srt[k]]
                a = AlnReg()
                av.append(a)
                s.aln = len(av) - 1
                a.w = opt.w
                a.rid = c.rid
                a.frac_rep = c.frac_rep
                a.seedlen0 = s.len
                a.chain = c
                if s.qbeg:  # left extension pair
                    qs = query[: s.qbeg][::-1]
                    tmp = s.rbeg - rmax0
                    rs = rseq[:tmp][::-1]
                    left_pairs.append(
                        _Pair(qs, rs, s.len * opt.a, li, s.aln)
                    )
                    a.qb, a.rb = s.qbeg, s.rbeg
                else:
                    a.score = a.truesc = s.len * opt.a
                    a.qb, a.rb = 0, s.rbeg
                if s.qbeg + s.len != l_query:  # right extension pair
                    qe = s.qbeg + s.len
                    re = s.rbeg + s.len - rmax0
                    qs = query[qe:]
                    rs = rseq[re:]
                    right_pairs.append(_Pair(qs, rs, 0, li, s.aln))
                    a.qe, a.re = qe, rmax0 + re
                else:
                    a.qe, a.re = l_query, s.rbeg + s.len
                    if a.rb != H0_SENTINEL and a.qb != H0_SENTINEL:
                        a.seedcov = _seedcov(a)

    # ---- left SW with band doubling (reference: src/bwamem.cpp:3040-3160) ----
    def run_side(pairs: list[_Pair], is_left: bool):
        end_bonus = opt.pen_clip5 if is_left else opt.pen_clip3
        pending = pairs
        for i in range(MAX_BAND_TRY):
            w = opt.w << i
            results = _run_round(pending, opt, w, end_bonus)
            nxt = []
            for p, r in zip(pending, results):
                a = regs_per_read[p.read_i][p.reg_i]
                prev = a.score
                a.score = r["score"]
                if (a.score == prev or r["max_off"] < (w >> 1) + (w >> 2)
                        or i + 1 == MAX_BAND_TRY):
                    if is_left:
                        if r["gscore"] <= 0 or r["gscore"] <= a.score - opt.pen_clip5:
                            a.qb -= r["qle"]
                            a.rb -= r["tle"]
                            a.truesc = a.score
                        else:
                            a.qb = 0
                            a.rb -= r["gtle"]
                            a.truesc = r["gscore"]
                    else:
                        if r["gscore"] <= 0 or r["gscore"] <= a.score - opt.pen_clip3:
                            a.qe += r["qle"]
                            a.re += r["tle"]
                            a.truesc += a.score - p.h0
                        else:
                            a.qe = len(queries[p.read_i])
                            a.re += r["gtle"]
                            a.truesc += r["gscore"] - p.h0
                    a.w = max(a.w, w)
                    if (a.rb != H0_SENTINEL and a.qb != H0_SENTINEL
                            and a.qe != H0_SENTINEL and a.re != H0_SENTINEL):
                        a.seedcov = _seedcov(a)
                else:
                    nxt.append(p)
            pending = nxt

    run_side(left_pairs, True)
    # right h0 = score after left extension (reference: src/bwamem.cpp:3168-3173)
    for p in right_pairs:
        p.h0 = regs_per_read[p.read_i][p.reg_i].score
    run_side(right_pairs, False)

    _purge_contained(opt, queries, chains_per_read, regs_per_read,
                     srt_per_chain)
    return regs_per_read


def _bucket(x, ladder):
    for b in ladder:
        if x <= b:
            return b
    return x


def extend_chains_batch_fused(opt, bns, text: np.ndarray,
                              queries: list[np.ndarray],
                              chains_per_read: list[list[Chain]],
                              text32) -> list[list[AlnReg]]:
    """Coordinate-based fused extension: identical semantics to
    extend_chains_batch, but the whole SW stage (both sides, both band
    tries) is ONE device dispatch of ops.banded_sw.fused_extend_coord —
    the host ships seed coordinates, not sequence bytes. ``text32`` is the
    device-resident packed reference (DeviceIndex.text32)."""
    return fused_extend_finish(
        fused_extend_submit(opt, bns, text, queries, chains_per_read, text32))


def fused_extend_submit(opt, bns, text, queries, chains_per_read, text32):
    """Dispatch half of extend_chains_batch_fused: builds the job arrays,
    enqueues the single fused device program, and returns a token WITHOUT
    blocking on the results — callers overlap other work (e.g. enqueueing
    the next batch's seeding) before fused_extend_finish()."""
    import jax.numpy as jnp

    from bwameme_tpu.ops.banded_sw import fused_extend_coord

    l_pac = bns.l_pac
    R = len(queries)
    regs_per_read: list[list[AlnReg]] = [[] for _ in queries]
    srt_per_chain: dict[tuple[int, int], list[int]] = {}

    # flat registry of alnregs in creation order
    flat_regs: list[AlnReg] = []
    flat_lq: list[int] = []
    h0seed: list[int] = []
    ljobs: list[tuple[int, int, int, int, int]] = []  # reg,row,qlen,tst,tln
    rjobs: list[tuple[int, int, int, int, int, int]] = []

    for li, (query, chains) in enumerate(zip(queries, chains_per_read)):
        l_query = len(query)
        av = regs_per_read[li]
        for cj, c in enumerate(chains):
            if not c.seeds:
                continue
            rmax0, rmax1 = l_pac << 1, 0
            for t in c.seeds:
                b = t.rbeg - (t.qbeg + cal_max_gap(opt, t.qbeg))
                e = t.rbeg + t.len + (
                    (l_query - t.qbeg - t.len)
                    + cal_max_gap(opt, l_query - t.qbeg - t.len)
                )
                rmax0 = min(rmax0, b)
                rmax1 = max(rmax1, e)
            rmax0 = max(rmax0, 0)
            rmax1 = min(rmax1, l_pac << 1)
            if rmax0 < l_pac < rmax1:
                if c.seeds[0].rbeg < l_pac:
                    rmax1 = l_pac
                else:
                    rmax0 = l_pac
            rmax0, rmax1, rid = clamp_to_contig(bns, rmax0, c.seeds[0].rbeg,
                                                rmax1)
            assert rid == c.rid

            srt = sorted(range(len(c.seeds)),
                         key=lambda i: (c.seeds[i].score, i))
            srt_per_chain[(li, cj)] = srt
            for k in range(len(c.seeds) - 1, -1, -1):
                s = c.seeds[srt[k]]
                a = AlnReg()
                av.append(a)
                s.aln = len(av) - 1
                g = len(flat_regs)
                flat_regs.append(a)
                flat_lq.append(l_query)
                h0seed.append(s.len * opt.a)
                a.w = opt.w
                a.rid = c.rid
                a.frac_rep = c.frac_rep
                a.seedlen0 = s.len
                a.chain = c
                if s.qbeg:
                    ljobs.append((g, li, s.qbeg, rmax0, s.rbeg - rmax0))
                    a.qb, a.rb = s.qbeg, s.rbeg
                else:
                    a.score = a.truesc = s.len * opt.a
                    a.qb, a.rb = 0, s.rbeg
                if s.qbeg + s.len != l_query:
                    qe = s.qbeg + s.len
                    rjobs.append((g, li, qe, l_query - qe, s.rbeg + s.len,
                                  rmax1 - (s.rbeg + s.len)))
                    a.qe, a.re = qe, s.rbeg + s.len
                else:
                    a.qe, a.re = l_query, s.rbeg + s.len
                    if a.rb != H0_SENTINEL and a.qb != H0_SENTINEL:
                        a.seedcov = _seedcov(a)

    G = len(flat_regs)
    left = right = None
    if G:
        # ---- one fused dispatch ----
        Lmax = max(len(q) for q in queries)
        codes = np.full((R, Lmax), 0, dtype=np.uint8)
        for i, q in enumerate(queries):
            codes[i, : len(q)] = np.minimum(q, 4)
        NL, NR = len(ljobs), len(rjobs)
        lane_ladder = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
        NLp = _bucket(max(NL, 1), lane_ladder)
        NRp = _bucket(max(NR, 1), lane_ladder)
        Gp = _bucket(G, lane_ladder)
        la = np.zeros((5, NLp), np.int32)
        la[0] = Gp  # sentinel reg: scatter drops, gathers read padding
        for i, j in enumerate(ljobs):
            la[:, i] = j
        ra = np.zeros((6, NRp), np.int32)
        ra[0] = Gp
        for i, j in enumerate(rjobs):
            ra[:, i] = j
        h0s = np.zeros(Gp, np.int32)
        h0s[:G] = h0seed
        Q = _bucket(int(max(la[2].max(initial=1), ra[3].max(initial=1))),
                    (64, 128, 192, 256, 512))
        TL = _bucket(int(la[4].max(initial=1)), (128, 256, 384, 512, 1024, 2048))
        TR = _bucket(int(ra[5].max(initial=1)), (128, 256, 384, 512, 1024, 2048))
        left, right = fused_extend_coord(
            text32, jnp.asarray(codes), jnp.asarray(opt.mat.astype(np.int32)),
            jnp.asarray(h0s),
            jnp.asarray(la[0]), jnp.asarray(la[1]), jnp.asarray(la[2]),
            jnp.asarray(la[3]), jnp.asarray(la[4]),
            jnp.asarray(ra[0]), jnp.asarray(ra[1]), jnp.asarray(ra[2]),
            jnp.asarray(ra[3]), jnp.asarray(ra[4]), jnp.asarray(ra[5]),
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.pen_clip5, opt.pen_clip3, opt.zdrop, opt.w,
            Q=Q, TL=TL, TR=TR,
        )
    return (opt, queries, chains_per_read, regs_per_read, srt_per_chain,
            flat_regs, flat_lq, h0seed, ljobs, rjobs, left, right)


def fused_extend_finish(token) -> list[list[AlnReg]]:
    """Blocking half of extend_chains_batch_fused: transfers the device
    results, folds them into the alnregs, and runs the contained-seed
    purge."""
    from bwameme_tpu.ops.banded_sw import EXT_RESULT_ORDER

    (opt, queries, chains_per_read, regs_per_read, srt_per_chain,
     flat_regs, flat_lq, h0seed, ljobs, rjobs, left, right) = token
    if left is not None:
        la, ra = np.asarray(left), np.asarray(right)
        left = {k: la[i] for i, k in enumerate(EXT_RESULT_ORDER)}
        right = {k: ra[i] for i, k in enumerate(EXT_RESULT_ORDER)}

        # ---- fold left results (reference: src/bwamem.cpp:3040-3160) ----
        for i, (g, _row, _ql, _tst, _tln) in enumerate(ljobs):
            a = flat_regs[g]
            a.score = int(left["score"][i])
            gsc = int(left["gscore"][i])
            if gsc <= 0 or gsc <= a.score - opt.pen_clip5:
                a.qb -= int(left["qle"][i])
                a.rb -= int(left["tle"][i])
                a.truesc = a.score
            else:
                a.qb = 0
                a.rb -= int(left["gtle"][i])
                a.truesc = gsc
            a.w = max(a.w, int(left["w_used"][i]))
            if (a.rb != H0_SENTINEL and a.qb != H0_SENTINEL
                    and a.qe != H0_SENTINEL and a.re != H0_SENTINEL):
                a.seedcov = _seedcov(a)
        # ---- fold right results ----
        for i, (g, _row, _qs, _ql, _tst, _tln) in enumerate(rjobs):
            a = flat_regs[g]
            h0r = a.score if a.score != -1 else h0seed[g]
            a.score = int(right["score"][i])
            gsc = int(right["gscore"][i])
            if gsc <= 0 or gsc <= a.score - opt.pen_clip3:
                a.qe += int(right["qle"][i])
                a.re += int(right["tle"][i])
                a.truesc += a.score - h0r
            else:
                a.qe = flat_lq[g]
                a.re += int(right["gtle"][i])
                a.truesc += gsc - h0r
            a.w = max(a.w, int(right["w_used"][i]))
            if (a.rb != H0_SENTINEL and a.qb != H0_SENTINEL
                    and a.qe != H0_SENTINEL and a.re != H0_SENTINEL):
                a.seedcov = _seedcov(a)

    _purge_contained(opt, queries, chains_per_read, regs_per_read,
                     srt_per_chain)
    return regs_per_read


def rescore_is_noop(opt, queries) -> bool:
    """True when mem_flt_chained_seeds (seed SW re-scoring) is a no-op for
    every read in the batch — the short-read fast-path precondition
    (reference: src/bwamem.cpp:571-574: the whole pass is skipped when
    min_l > MEM_SEEDSW_COEF * l_query)."""
    import math

    for q in queries:
        lq = len(q)
        if lq <= 0:
            continue
        min_l = (MEM_HSP_COEF_ * opt.min_chain_weight
                 if opt.min_chain_weight
                 else MEM_MINSC_COEF_ * math.log(lq))
        if min_l <= MEM_SEEDSW_COEF_ * lq:
            return False
    return True


MEM_HSP_COEF_ = 1.1
MEM_MINSC_COEF_ = 5.5
MEM_SEEDSW_COEF_ = 0.05


def extend_flat_submit(opt, bns, queries, chain_raw, text32):
    """Fully-native fast path of the fused extension: alnreg table and
    coordinate jobs built by C++ (extend_prepare_c) straight from the flat
    chain arrays — no per-seed Python — then ONE single-round device
    dispatch (band retries are redispatched from extend_flat_finish's
    ladder only when the retry predicate actually fires). Returns a token
    for extend_flat_finish, or None when native/preconditions are
    unavailable (callers use fused_extend_submit on dataclass chains)."""
    import jax.numpy as jnp

    from bwameme_tpu.align import native
    from bwameme_tpu.ops.banded_sw import fused_extend_round

    if not native.available() or chain_raw is None:
        return None
    (chain_off, _pos, chain_rid, chain_is_alt, _w, _kept, chain_frac_rep,
     seed_off, seed_rbeg, seed_qbeg, seed_len, _n) = chain_raw
    R = len(queries)
    lq = np.asarray([len(q) for q in queries], np.int32)
    ctg_off = np.ascontiguousarray(
        [c.offset for c in bns.contigs], dtype=np.int64)
    prep = native.extend_prepare_native(
        opt, bns, lq, chain_off, chain_rid, chain_frac_rep, seed_off,
        seed_rbeg, seed_qbeg, seed_len, ctg_off)
    if prep is None:
        return None
    G = prep["n_regs"]
    left = right = aux = None
    if G:
        Lmax = max(len(q) for q in queries)
        codes = np.zeros((R, Lmax), dtype=np.uint8)
        for i, q in enumerate(queries):
            codes[i, : len(q)] = np.minimum(q, 4)
        NL, NR = prep["n_left"], prep["n_right"]
        lane_ladder = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
        NLp = _bucket(max(NL, 1), lane_ladder)
        NRp = _bucket(max(NR, 1), lane_ladder)
        Gp = _bucket(G, lane_ladder)
        h0s = np.zeros(Gp, np.int32)
        h0s[:G] = prep["reg_h0seed"][:G]
        Q = int(max(prep["l_qlen"][:NL].max(initial=1),
                    prep["r_qlen"][:NR].max(initial=1)))
        Q = _bucket(Q, (64, 128, 192, 256, 512))
        TL = _bucket(int(prep["l_tlen"][:NL].max(initial=1)),
                     (128, 256, 384, 512, 1024, 2048))
        TR = _bucket(int(prep["r_tlen"][:NR].max(initial=1)),
                     (128, 256, 384, 512, 1024, 2048))
        codes_dev = jnp.asarray(codes)
        mat_dev = jnp.asarray(opt.mat.astype(np.int32))
        h0_dev = jnp.asarray(h0s)
        if _EXT_BUCKETS:
            # tile-class dispatches: left classes -> on-device score
            # scatter -> right classes (h0 chains through score_reg)
            from bwameme_tpu.ops.banded_sw import scatter_scores

            score_reg = h0_dev
            left = _submit_side_buckets(
                opt, prep, "l", score_reg, codes_dev, mat_dev, text32,
                opt.pen_clip5, Gp)
            for idx, res_dev, Np in left:
                reg_pad = np.full(Np, Gp, np.int32)
                reg_pad[: len(idx)] = prep["l_reg"][idx]
                score_reg = scatter_scores(score_reg,
                                           jnp.asarray(reg_pad), res_dev[0])
            right = _submit_side_buckets(
                opt, prep, "r", score_reg, codes_dev, mat_dev, text32,
                opt.pen_clip3, Gp)
        else:
            jobs = _pack_jobs(prep, np.arange(NL),
                              np.full(NL, opt.w, np.int32), np.arange(NR),
                              np.full(NR, opt.w, np.int32), NLp, NRp, Gp)
            left, right = fused_extend_round(
                text32, codes_dev, mat_dev, h0_dev, jnp.asarray(jobs),
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                opt.pen_clip5, opt.pen_clip3, opt.zdrop,
                NL=NLp, NR=NRp, Q=Q, TL=TL, TR=TR,
            )
        aux = dict(text32=text32, codes_dev=codes_dev, mat_dev=mat_dev,
                   Gp=Gp, Q=Q, TL=TL, TR=TR)
    return (opt, queries, lq, chain_raw, prep, left, right, aux)


# tile-class ladders for the per-side extension dispatches. T is the DP row
# trip count (any value; each distinct value is one compiled program); the
# lane dim is W = Q+2, padded by the compiler to a multiple of 128, so only
# the W-crossing Q steps are distinct classes.
_EXT_T_LADDER = (48, 96, 160, 272, 384, 512, 1024, 2048, 4096)
# 272 not 256: right-side targets are len + 2w + 1 = 257 at the 151 bp /
# w=100 defaults (measured qlen/tlen distribution, tools/probe_extend.py)
# — a 256 bucket pushed EVERY right job into T=384 (+33% trips)
_EXT_Q_LADDER = (126, 254, 510, 1022)
_EXT_MIN_BUCKET = 384  # dispatch overhead floor: merge smaller classes up
_EXT_BUCKETS = os.environ.get("BWAMEME_EXT_BUCKETS", "1") == "1"


def _tile_partition(tlens: np.ndarray) -> list[tuple[int, np.ndarray]]:
    """Greedy target-length classes over the T ladder; classes smaller than
    the dispatch-overhead floor merge into the next (larger-T) class."""
    groups: list[list] = []
    rem = np.arange(len(tlens))
    for cap in _EXT_T_LADDER:
        m = tlens[rem] <= cap
        grp, rem = rem[m], rem[~m]
        if len(grp):
            groups.append([cap, grp])
        if not len(rem):
            break
    if len(rem):
        raise ValueError(
            f"extension target length {int(tlens.max())} exceeds the "
            f"{_EXT_T_LADDER[-1]} tile ladder")
    i = 0
    while i < len(groups) - 1:
        if len(groups[i][1]) < _EXT_MIN_BUCKET:
            groups[i + 1][1] = np.concatenate([groups[i][1],
                                               groups[i + 1][1]])
            del groups[i]
        else:
            i += 1
    if len(groups) > 1 and len(groups[-1][1]) < _EXT_MIN_BUCKET:
        groups[-2][0] = groups[-1][0]
        groups[-2][1] = np.concatenate([groups[-2][1], groups[-1][1]])
        del groups[-1]
    return [(cap, idx) for cap, idx in groups]


def _submit_side_buckets(opt, prep, side, score_reg_dev, codes_dev, mat_dev,
                         text32, end_bonus, Gp):
    """Dispatch one side's jobs as per-tile-class extend_side_round calls;
    returns [(orig_idx, res_dev, Np), ...] (device arrays un-awaited)."""
    import jax.numpy as jnp

    from bwameme_tpu.ops.banded_sw import extend_side_round

    n = prep["n_left"] if side == "l" else prep["n_right"]
    if not n:
        return []
    tl = np.asarray(prep[f"{side}_tlen"][:n])
    ql = np.asarray(prep[f"{side}_qlen"][:n])
    lane_ladder = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
    out = []
    for cap, idx in _tile_partition(tl):
        Np = _bucket(len(idx), lane_ladder)
        Qb = _bucket(int(ql[idx].max(initial=1)), _EXT_Q_LADDER)
        jobs = np.zeros((7, Np), np.int32)
        jobs[0, :] = Gp  # pad lanes: sentinel reg (clipped h0, dropped out)
        jobs[0, : len(idx)] = prep[f"{side}_reg"][idx]
        jobs[1, : len(idx)] = prep[f"{side}_row"][idx]
        if side == "r":
            jobs[2, : len(idx)] = prep["r_qstart"][idx]
        jobs[3, : len(idx)] = ql[idx]
        jobs[4, : len(idx)] = prep[f"{side}_tstart"][idx].astype(np.int32)
        jobs[5, : len(idx)] = tl[idx]
        jobs[6, : len(idx)] = opt.w
        res = extend_side_round(
            text32, codes_dev, mat_dev, score_reg_dev, jnp.asarray(jobs),
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, end_bonus,
            opt.zdrop, reverse=(side == "l"), N=Np, Q=Qb, T=cap)
        out.append((idx, res, Np))
    return out


def _pack_jobs(prep, l_idx, l_ws, r_idx, r_ws, NLp, NRp, Gp):
    """ONE (13, P) int32 upload carrying both sides' job coordinates
    (sentinel reg=Gp + zero lengths on pad lanes)."""
    P = max(NLp, NRp)
    jobs = np.zeros((13, P), np.int32)
    jobs[0, :NLp] = Gp
    jobs[6, :NRp] = Gp
    nl, nr = len(l_idx), len(r_idx)
    jobs[0, :nl] = prep["l_reg"][l_idx]
    jobs[1, :nl] = prep["l_row"][l_idx]
    jobs[2, :nl] = prep["l_qlen"][l_idx]
    jobs[3, :nl] = prep["l_tstart"][l_idx].astype(np.int32)
    jobs[4, :nl] = prep["l_tlen"][l_idx]
    jobs[5, :nl] = l_ws
    jobs[6, :nr] = prep["r_reg"][r_idx]
    jobs[7, :nr] = prep["r_row"][r_idx]
    jobs[8, :nr] = prep["r_qstart"][r_idx]
    jobs[9, :nr] = prep["r_qlen"][r_idx]
    jobs[10, :nr] = prep["r_tstart"][r_idx].astype(np.int32)
    jobs[11, :nr] = prep["r_tlen"][r_idx]
    jobs[12, :nr] = r_ws
    return jobs


def _dispatch_retry_round(opt, prep, aux, h0_reg, l_idx, l_ws, r_idx, r_ws):
    """Run a follow-up extension round for the given job subsets; returns
    per-subset result dicts."""
    import jax.numpy as jnp

    from bwameme_tpu.ops.banded_sw import EXT_ROUND_ORDER, fused_extend_round

    small = (64, 256, 1024, 4096, 16384, 32768)
    NLp = _bucket(max(len(l_idx), 1), small)
    NRp = _bucket(max(len(r_idx), 1), small)
    jobs = _pack_jobs(prep, l_idx, l_ws, r_idx, r_ws, NLp, NRp, aux["Gp"])
    la, ra = fused_extend_round(
        aux["text32"], aux["codes_dev"], aux["mat_dev"],
        jnp.asarray(h0_reg), jnp.asarray(jobs),
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
        opt.pen_clip5, opt.pen_clip3, opt.zdrop,
        NL=NLp, NR=NRp, Q=aux["Q"], TL=aux["TL"], TR=aux["TR"],
    )
    cat = np.asarray(jnp.concatenate([la, ra], axis=1))  # one fetch
    la, ra = cat[:, : la.shape[1]], cat[:, la.shape[1]:]
    L2 = {k: la[i, : len(l_idx)] for i, k in enumerate(EXT_ROUND_ORDER)}
    R2 = {k: ra[i, : len(r_idx)] for i, k in enumerate(EXT_ROUND_ORDER)}
    return L2, R2


def extend_flat_finish(token) -> list[list[AlnReg]]:
    """Blocking half of extend_flat_submit: transfer, the band-retry
    ladder (reference: src/bwamem.cpp:2968-3022 MAX_BAND_TRY=2 — rerun a
    side at doubled band iff the score changed AND max_off crossed the
    band threshold; a rerun left also reruns its dependent right with the
    new h0), then native fold + seedcov + purge and AlnReg
    materialization."""
    from bwameme_tpu.align import native
    from bwameme_tpu.ops.banded_sw import EXT_ROUND_ORDER

    (opt, queries, lq, chain_raw, prep, left, right, aux) = token
    (chain_off, _pos, chain_rid, chain_is_alt, _w, _kept, _frep,
     seed_off, seed_rbeg, seed_qbeg, seed_len, _n) = chain_raw
    R = len(queries)
    G = prep["n_regs"]
    if G:
        nl, nr = prep["n_left"], prep["n_right"]

        def _assemble_both(left_res, right_res, nl, nr):
            """One device->host fetch for ALL tile-class buckets of both
            sides: each fetch costs a fixed ~85 ms tunnel latency, so the
            per-bucket asarray of the first tile-class version multiplied
            the extension wall (r3's unexplained e2e regression)."""
            import jax.numpy as jnp

            sides = []
            for side_res, n in ((left_res, nl), (right_res, nr)):
                if not isinstance(side_res, list):
                    sides.append(("flat", side_res, n))
                else:
                    sides.append(("buckets", side_res, n))
            devs = []
            for kind, res, n in sides:
                if kind == "flat":
                    devs.append(res)
                else:
                    devs.extend(r[1] for r in res)
            if not devs:
                # both sides empty while G > 0: every seed spans its full
                # read (exact full-length hits), so no extension jobs exist
                return [{k: np.zeros(n, np.int32) for k in EXT_ROUND_ORDER}
                        for _, _, n in sides]
            if len(devs) > 1:
                cat = np.asarray(jnp.concatenate(devs, axis=1))
            else:
                cat = np.asarray(devs[0])
            outs = []
            col = 0
            for kind, res, n in sides:
                out = {k: np.zeros(n, np.int32) for k in EXT_ROUND_ORDER}
                if kind == "flat":
                    w = res.shape[1]
                    for i, k in enumerate(EXT_ROUND_ORDER):
                        out[k][:] = cat[i, col: col + n]
                    col += w
                else:
                    for idx, res_dev, _Np in res:
                        w = res_dev.shape[1]
                        blk = cat[:, col: col + w]
                        for i, k in enumerate(EXT_ROUND_ORDER):
                            out[k][idx] = blk[i, : len(idx)]
                        col += w
                outs.append(out)
            return outs

        L, Rt = _assemble_both(left, right, nl, nr)
        w0 = opt.w
        thr = (w0 >> 1) + (w0 >> 2)
        # round-1 retry predicate (left prev is -1, so only max_off gates)
        l_retry = L["max_off"] >= thr
        r_retry = (Rt["score"] != Rt["h0"]) & (Rt["max_off"] >= thr)
        if l_retry.any() or r_retry.any():
            l_idx = np.flatnonzero(l_retry)
            lr_regs = prep["l_reg"][:nl][l_idx]
            # rights whose reg's left is being rerun get a fresh h0 run at
            # w; independently-retried rights rerun at 2w directly
            rd_mask = np.isin(prep["r_reg"][:nr], lr_regs)
            r_idx = np.flatnonzero(rd_mask | r_retry)
            r_ws2 = np.where(rd_mask[r_idx], w0, 2 * w0).astype(np.int32)
            h0p = np.zeros(aux["Gp"], np.int32)
            h0p[:G] = prep["reg_h0seed"][:G]
            keep = np.flatnonzero(~l_retry)
            h0p[prep["l_reg"][:nl][keep]] = L["score"][keep]
            L2, R2 = _dispatch_retry_round(
                opt, prep, aux, h0p, l_idx,
                np.full(len(l_idx), 2 * w0, np.int32), r_idx, r_ws2)
            for k in EXT_ROUND_ORDER:
                L[k][l_idx] = L2[k]
                Rt[k][r_idx] = R2[k]
            # a dependent right that ran at w may itself retry once more
            again = np.zeros(nr, bool)
            again[r_idx] = ((R2["score"] != R2["h0"])
                            & (R2["max_off"] >= thr)
                            & (R2["w_used"] == w0))
            a_idx = np.flatnonzero(again)
            if len(a_idx):
                h0f = h0p.copy()
                h0f[lr_regs] = L["score"][l_idx]
                _, R3 = _dispatch_retry_round(
                    opt, prep, aux, h0f, np.zeros(0, np.intp),
                    np.zeros(0, np.int32), a_idx,
                    np.full(len(a_idx), 2 * w0, np.int32))
                for k in EXT_ROUND_ORDER:
                    Rt[k][a_idx] = R3[k]
        read_reg_off = np.searchsorted(
            prep["reg_read"][:G], np.arange(R + 1)).astype(np.int32)
        native.extend_finalize_native(
            opt, lq, read_reg_off, prep, chain_off, seed_off, seed_rbeg,
            seed_qbeg, seed_len, L, Rt)
    regs_per_read: list[list[AlnReg]] = [[] for _ in queries]
    alt_of_chain = np.asarray(chain_is_alt) != 0
    cols = [prep[k][:G].tolist() for k in (
        "reg_read", "reg_rb", "reg_re", "reg_qb", "reg_qe", "reg_rid",
        "reg_score", "reg_truesc", "reg_w", "reg_seedcov", "reg_seedlen0",
        "reg_frac_rep")]
    alt = alt_of_chain[prep["reg_chain"][:G]].tolist()
    for (r, rb, re, qb, qe, rid, sc, tsc, w, cov, sl0, frep), ia in zip(
            zip(*cols), alt):
        regs_per_read[r].append(AlnReg(
            rb=rb, re=re, qb=qb, qe=qe, rid=rid, score=sc, truesc=tsc,
            w=w, seedcov=cov, seedlen0=sl0, frac_rep=frep, is_alt=ia,
            chain=None,
        ))
    return regs_per_read


def _purge_contained(opt, queries, chains_per_read, regs_per_read,
                     srt_per_chain):
    # ---- contained-seed purge (reference: src/bwamem.cpp:3390-3489) ----
    for li, (query, chains) in enumerate(zip(queries, chains_per_read)):
        l_query = len(query)
        av = regs_per_read[li]
        lim = 0
        for cj, c in enumerate(chains):
            if not c.seeds:
                continue
            srt = srt_per_chain[(li, cj)]
            purged = [False] * len(c.seeds)
            for k in range(len(c.seeds) - 1, -1, -1):
                s = c.seeds[srt[k]]
                v = 0
                found = False
                for p in av:
                    if v >= lim:
                        break
                    if p.qb == -1 and p.qe == -1:
                        continue
                    if (s.rbeg < p.rb or s.rbeg + s.len > p.re
                            or s.qbeg < p.qb or s.qbeg + s.len > p.qe):
                        v += 1
                        continue
                    if s.len - p.seedlen0 > 0.1 * l_query:
                        v += 1
                        continue
                    qd = s.qbeg - p.qb
                    rd = s.rbeg - p.rb
                    max_gap = cal_max_gap(opt, min(qd, rd))
                    ww = min(max_gap, p.w)
                    if qd - rd < ww and rd - qd < ww:
                        found = True
                        break
                    qd = p.qe - (s.qbeg + s.len)
                    rd = p.re - (s.rbeg + s.len)
                    max_gap = cal_max_gap(opt, min(qd, rd))
                    ww = min(max_gap, p.w)
                    if qd - rd < ww and rd - qd < ww:
                        found = True
                        break
                    v += 1
                if found:
                    ok = True
                    for v2 in range(k + 1, len(c.seeds)):
                        if purged[v2]:
                            continue
                        t = c.seeds[srt[v2]]
                        if t.len < s.len * 0.95:
                            continue
                        if (s.qbeg <= t.qbeg and s.qbeg + s.len - t.qbeg >= s.len >> 2
                                and t.qbeg - s.qbeg != t.rbeg - s.rbeg):
                            ok = False
                            break
                        if (t.qbeg <= s.qbeg and t.qbeg + t.len - s.qbeg >= s.len >> 2
                                and s.qbeg - t.qbeg != s.rbeg - t.rbeg):
                            ok = False
                            break
                    if ok:
                        ar = av[s.aln]
                        ar.qb = ar.qe = -1
                        purged[k] = True
                        continue
                lim += 1
    return regs_per_read
