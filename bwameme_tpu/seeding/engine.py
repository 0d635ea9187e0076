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
from bwameme_tpu.ops.sa_search import DeviceIndex, make_search_fns
from bwameme_tpu.seeding.host_engine import HostSeedingEngine, Smem

# state-machine phases
DONE = 0
RIGHT0 = 1   # right search at an outer pivot (emits)
LEFT = 2     # left extension in the zigzag (no emit)
RIGHT_Z = 3  # right search in the zigzag (emits)


class DeviceSeedingEngine:
    def __init__(self, idx, opt, max_read_len: int = 512,
                 lanes: int = 1024) -> None:
        self.idx = idx
        self.opt = opt
        self.di = DeviceIndex.from_host(idx)
        self.fns = make_search_fns(self.di, max_read_words=(max_read_len // 16) + 2)
        self.max_read_len = max_read_len
        # fixed lane count -> exactly one compilation per query kernel
        # (shrinking active sets run with inert lanes; gathers are cheap)
        self.lanes = lanes
        self._tr = self._build_third_round()

    # ------------------------------------------------------------- packing
    def _prepare(self, codes_list: list[np.ndarray]):
        R = len(codes_list)
        maxlen = max((len(c) for c in codes_list), default=1)
        W = (maxlen + 15) // 16 + 3  # +guard words (all T)
        qbuf = np.full((2 * R, W), 0xFFFFFFFF, dtype=np.uint32)
        next_f = []
        next_r = []
        for i, codes in enumerate(codes_list):
            c = np.minimum(codes, 4)
            safe = np.where(c >= 4, 0, c).astype(np.uint8)
            rc = np.where(c < 4, 3 - c, c)[::-1]
            rc_safe = np.where(rc >= 4, 0, rc).astype(np.uint8)
            wf = pack_words(safe, pad_code=3)
            wr = pack_words(rc_safe, pad_code=3)
            qbuf[i, : len(wf)] = wf
            qbuf[R + i, : len(wr)] = wr
            next_f.append(HostSeedingEngine._next_n(c))
            next_r.append(HostSeedingEngine._next_n(rc))
        return jnp.asarray(qbuf), next_f, next_r

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
            qbuf, jnp.asarray(row), jnp.asarray(piv), jnp.asarray(v),
            jnp.asarray(mi),
        )
        return (np.asarray(mlen)[:n], np.asarray(lb)[:n], np.asarray(cnt)[:n])

    # -------------------------------------------------------- steps 1 and 2
    def collect_smems_batch(self, codes_list: list[np.ndarray]) -> list[list[Smem]]:
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

        # ---- step 2: reseeding (OnePos machines per qualifying SMEM)
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

        # ---- step 3: bwt seed strategy
        if opt.max_mem_intv > 0:
            self._third_round_batch(qbuf, codes_list, next_f, smems)

        return smems

    # ------------------------------------------------------------- round 3
    def _build_third_round(self):
        fns = self.fns
        n_sa = self.di.n_sa

        @jax.jit
        def third_round(qbuf32, row, pivot, v, min_intv, min_seed):
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

        return third_round

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
                    qbuf, jnp.asarray(row), jnp.asarray(piv), jnp.asarray(v),
                    jnp.int32(opt.max_mem_intv), jnp.int32(s),
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

    def sorted_smems(self, codes: np.ndarray) -> list[Smem]:
        return self.sorted_smems_batch([codes])[0]
