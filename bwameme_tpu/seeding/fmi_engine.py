"""FM-index seeding backend (host contract engine).

Scalar semantic model of the reference's FM-index SMEM search — the default
(non ``-7``) backend and the differential-test oracle of the seeding layer:

* bidirectional ``backwardExt`` with the sentinel-offset rule for the
  complement interval (reference: src/FMI_search.cpp:1039-1067);
* forward extension = backward extension of the complement with k/l swapped
  (reference: src/FMI_search.cpp:543-551);
* round 1: all-position SMEM sweep ``getSMEMsAllPosOneThread`` driving the
  per-pivot forward/backward pass ``getSMEMsOnePosOneThread``
  (reference: src/FMI_search.cpp:506-683, 686-737);
* round 2: re-seed long/rare SMEMs at their midpoint with
  min_intv = hitcount+1 (reference: src/bwamem.cpp:760-790);
* round 3: forward-only ``bwtSeedStrategyAllPosOneThread`` with max_intv
  (reference: src/FMI_search.cpp:738-830).

Emits the same Smem tuples as the learned-index engines (start, end, sa_lo,
hitcount) with sa_lo in THIS index's suffix-array coordinates; hit positions
come from ``FmIndex.sa`` (``sa_positions`` below), so chaining is shared.
"""

from __future__ import annotations

import numpy as np

from bwameme_tpu.index.fmindex import FmIndex, build_fm_index
from bwameme_tpu.seeding.host_engine import Smem


class FmiHostEngine:
    def __init__(self, idx, opt, fm: FmIndex | None = None) -> None:
        self.idx = idx
        self.opt = opt
        self.fm = fm if fm is not None else build_fm_index(idx.bns.code)
        self.sa_positions = self.fm.sa

    # ------------------------------------------------------ interval algebra
    def _init_intv(self, a: int) -> tuple[int, int, int]:
        c = self.fm.count
        return int(c[a]), int(c[3 - a]), int(c[a + 1] - c[a])

    def backward_ext(self, k: int, l: int, s: int, a: int):
        fm = self.fm
        occ_k = [int(fm.occ(b, k)) for b in range(4)]
        occ_ks = [int(fm.occ(b, k + s)) for b in range(4)]
        sb = [occ_ks[b] - occ_k[b] for b in range(4)]
        kb = [int(fm.count[b]) + occ_k[b] for b in range(4)]
        sent = 1 if (k <= fm.sentinel_index < k + s) else 0
        l3 = l + sent
        l2 = l3 + sb[3]
        l1 = l2 + sb[2]
        l0 = l1 + sb[1]
        lb = [l0, l1, l2, l3]
        return kb[a], lb[a], sb[a]

    def forward_ext(self, k: int, l: int, s: int, a: int):
        nk, nl, ns = self.backward_ext(l, k, s, 3 - a)
        return nl, nk, ns

    # -------------------------------------------------------------- round 1/2
    def _one_pos(self, codes: np.ndarray, x: int, min_intv: int,
                 min_seed: int, out: list[Smem]) -> int:
        """One forward/backward SMEM pass from pivot x; returns the next
        pivot (reference: FMI_search.cpp:506-683)."""
        l_seq = len(codes)
        a = int(codes[x])
        next_x = x + 1
        if a >= 4:
            return next_x
        k, l, s = self._init_intv(a)
        m, n = x, x
        prev: list[tuple[int, int, int, int, int]] = []
        j = x + 1
        while j < l_seq:
            a = int(codes[j])
            next_x = j + 1
            if a >= 4:
                break
            nk, nl, ns = self.forward_ext(k, l, s, a)
            if ns != s:
                prev.append((k, l, s, m, n))
            if ns < min_intv:
                next_x = j           # restart at the failing column
                break
            k, l, s, n = nk, nl, ns, j
            j += 1
        if s >= min_intv:
            prev.append((k, l, s, m, n))
        prev.reverse()               # longest-first

        for j in range(x - 1, -1, -1):
            a = int(codes[j])
            if a >= 4:
                break
            curr: list[tuple[int, int, int, int, int]] = []
            curr_s = -1
            p = 0
            while p < len(prev):
                pk, pl, ps, pm, pn = prev[p]
                nk, nl, ns = self.backward_ext(pk, pl, ps, a)
                if ns < min_intv and (pn - pm + 1) >= min_seed:
                    out.append(Smem(pm, pn + 1, pk, ps))
                    p += 1
                    break
                if ns >= min_intv and ns != curr_s:
                    curr_s = ns
                    curr.append((nk, nl, ns, j, pn))
                    p += 1
                    break
                p += 1
            while p < len(prev):
                pk, pl, ps, pm, pn = prev[p]
                nk, nl, ns = self.backward_ext(pk, pl, ps, a)
                if ns >= min_intv and ns != curr_s:
                    curr_s = ns
                    curr.append((nk, nl, ns, j, pn))
                p += 1
            prev = curr
            if not prev:
                break
        if prev:
            pk, pl, ps, pm, pn = prev[0]
            if pn - pm + 1 >= min_seed:
                out.append(Smem(pm, pn + 1, pk, ps))
        return next_x

    # ---------------------------------------------------------------- round 3
    def _bwt_seed_strategy(self, codes: np.ndarray, max_intv: int,
                           min_seed1: int, out: list[Smem]) -> None:
        l_seq = len(codes)
        x = 0
        while x < l_seq:
            next_x = x + 1
            a = int(codes[x])
            if a < 4:
                k, l, s = self._init_intv(a)
                m, n = x, x
                j = x + 1
                while j < l_seq:
                    next_x = j + 1
                    a = int(codes[j])
                    if a >= 4:
                        break
                    k, l, s = self.forward_ext(k, l, s, a)
                    n = j
                    if s < max_intv and (n - m + 1) >= min_seed1:
                        if s > 0:
                            out.append(Smem(m, n + 1, k, s))
                        break
                    j += 1
            x = next_x

    # -------------------------------------------------------------- interface
    def collect_smems(self, codes: np.ndarray) -> list[Smem]:
        opt = self.opt
        codes = np.minimum(codes, 4)
        out: list[Smem] = []
        x = 0
        while x < len(codes):
            x = self._one_pos(codes, x, 1, opt.min_seed_len, out)

        # round 2: re-seed long low-occurrence SMEMs at their midpoint
        n_round1 = len(out)
        for i in range(n_round1):
            sm = out[i]
            if (sm.end - sm.start) < opt.split_len or sm.hitcount > opt.split_width:
                continue
            self._one_pos(codes, (sm.start + sm.end) >> 1, sm.hitcount + 1,
                          opt.min_seed_len, out)

        if opt.max_mem_intv > 0:
            self._bwt_seed_strategy(codes, opt.max_mem_intv,
                                    opt.min_seed_len + 1, out)
        return out

    def sorted_smems(self, codes: np.ndarray) -> list[Smem]:
        return sorted(self.collect_smems(codes), key=lambda s: (s.start, s.end))

    def sorted_smems_batch(self, codes_list):
        return [self.sorted_smems(c) for c in codes_list]


# ---------------------------------------------------------------------------
# Device engine
# ---------------------------------------------------------------------------

FWD, BWD, FWD3, DONE = 0, 1, 2, 3


class _Machine:
    """One getSMEMsOnePosOneThread (or round-3 forward sweep) in flight."""

    __slots__ = ("read", "codes", "min_intv", "min_seed", "x", "j",
                 "k", "l", "s", "m", "n", "prev", "phase", "next_x", "out")

    def __init__(self, read, codes, x, min_intv, min_seed, k, l, s, phase, out):
        self.read = read
        self.codes = codes
        self.min_intv = min_intv
        self.min_seed = min_seed
        self.x = x
        self.j = x + 1
        self.k, self.l, self.s = k, l, s
        self.m, self.n = x, x
        self.prev = []
        self.phase = phase
        self.next_x = x + 1
        self.out = out


class FmiDeviceEngine:
    """Batched FM-index seeding: the per-read SMEM state machines run on the
    host (nanoseconds of control flow), every occ/extension wave runs as ONE
    batched device call (`ops/fmi_search.backward_ext` — forward extensions
    are pre-swapped on the host so both directions share the dispatch).

    Produces bit-identical SMEM multisets to FmiHostEngine (differentially
    tested), which replicates the reference FMI_search.cpp semantics.
    """

    def __init__(self, idx, opt, fm: FmIndex | None = None,
                 lanes: int = 2048) -> None:
        from bwameme_tpu.ops.fmi_search import DeviceFmIndex, make_fmi_fns

        self.idx = idx
        self.opt = opt
        self.fm = fm if fm is not None else build_fm_index(idx.bns.code)
        self.dfm = DeviceFmIndex.from_host(self.fm)
        self.fns = make_fmi_fns(self.dfm)
        self.sa_positions = self.fm.sa
        self.lanes = lanes
        self.count = self.fm.count

    def _init_intv(self, a: int):
        c = self.count
        return int(c[a]), int(c[3 - a]), int(c[a + 1] - c[a])

    def _ext_wave(self, units):
        """units: list of (k, l, s, a) backward-ext problems; returns
        (nk, nl, ns) numpy arrays."""
        import jax.numpy as jnp

        nu = len(units)
        outs = [np.empty(nu, np.int64) for _ in range(3)]
        for off in range(0, nu, self.lanes):
            chunk = units[off: off + self.lanes]
            L = self.lanes
            k = np.zeros(L, np.int32)
            l = np.zeros(L, np.int32)
            s = np.zeros(L, np.int32)
            a = np.zeros(L, np.int32)
            for t, (uk, ul, us, ua) in enumerate(chunk):
                k[t], l[t], s[t], a[t] = uk, ul, us, ua
            nk, nl, ns = self.fns["backward_ext"](
                self.dfm, jnp.asarray(k), jnp.asarray(l), jnp.asarray(s),
                jnp.asarray(a))
            m = len(chunk)
            outs[0][off: off + m] = np.asarray(nk)[:m]
            outs[1][off: off + m] = np.asarray(nl)[:m]
            outs[2][off: off + m] = np.asarray(ns)[:m]
        return outs

    # ---------------------------------------------------------- wave driver
    def _run_machines(self, machines: list[_Machine]) -> None:
        """Run a set of machines to completion in lockstep waves."""
        active = [mc for mc in machines if mc.phase != DONE]
        while active:
            units = []
            owners = []  # (machine, kind)
            for mc in active:
                codes = mc.codes
                if mc.phase in (FWD, FWD3):
                    if mc.j >= len(codes) or codes[mc.j] >= 4:
                        continue  # resolved on host below
                    a = int(codes[mc.j])
                    # forward ext = backward ext with (l, k) and comp base
                    units.append((mc.l, mc.k, mc.s, 3 - a))
                    owners.append((mc, -1))
                else:  # BWD
                    a = int(codes[mc.j])
                    if a >= 4:
                        continue  # resolved on host below
                    for p, (pk, pl, ps, pm, pn) in enumerate(mc.prev):
                        units.append((pk, pl, ps, a))
                        owners.append((mc, p))
            res = {}
            if units:
                nk, nl, ns = self._ext_wave(units)
                for t, (mc, p) in enumerate(owners):
                    res.setdefault(id(mc), {})[p] = (
                        int(nk[t]), int(nl[t]), int(ns[t]))
            nxt = []
            for mc in active:
                self._step(mc, res.get(id(mc)))
                if mc.phase != DONE:
                    nxt.append(mc)
            active = nxt

    def _finish_forward(self, mc: _Machine) -> None:
        if mc.s >= mc.min_intv:
            mc.prev.append((mc.k, mc.l, mc.s, mc.m, mc.n))
        mc.prev.reverse()
        mc.j = mc.x - 1
        if not mc.prev:
            mc.phase = DONE
        elif mc.j < 0:
            self._finalize(mc)
        else:
            mc.phase = BWD

    def _finalize(self, mc: _Machine) -> None:
        if mc.prev:
            pk, pl, ps, pm, pn = mc.prev[0]
            if pn - pm + 1 >= mc.min_seed:
                mc.out.append(Smem(pm, pn + 1, pk, ps))
        mc.phase = DONE

    def _step(self, mc: _Machine, res) -> None:
        codes = mc.codes
        if mc.phase == FWD:
            if mc.j >= len(codes):
                mc.next_x = mc.j
                return self._finish_forward(mc)
            if codes[mc.j] >= 4:
                mc.next_x = mc.j + 1
                return self._finish_forward(mc)
            nk, nl, ns = res[-1]
            nl, nk = nk, nl  # un-swap: result of forward extension
            if ns != mc.s:
                mc.prev.append((mc.k, mc.l, mc.s, mc.m, mc.n))
            if ns < mc.min_intv:
                mc.next_x = mc.j
                return self._finish_forward(mc)
            mc.k, mc.l, mc.s, mc.n = nk, nl, ns, mc.j
            mc.j += 1
            mc.next_x = mc.j
        elif mc.phase == FWD3:
            # round 3: forward-only (reference: FMI_search.cpp:738-830)
            if mc.j >= len(codes):
                mc.next_x = mc.j
                mc.phase = DONE
                return
            if codes[mc.j] >= 4:
                mc.next_x = mc.j + 1
                mc.phase = DONE
                return
            nk, nl, ns = res[-1]
            nl, nk = nk, nl
            mc.k, mc.l, mc.s, mc.n = nk, nl, ns, mc.j
            mc.next_x = mc.j + 1
            if ns < mc.min_intv and (mc.n - mc.m + 1) >= mc.min_seed:
                if ns > 0:
                    mc.out.append(Smem(mc.m, mc.n + 1, nk, ns))
                mc.phase = DONE
                return
            mc.j += 1
        elif mc.phase == BWD:
            if codes[mc.j] >= 4:
                return self._finalize(mc)
            curr = []
            curr_s = -1
            p = 0
            prev = mc.prev
            while p < len(prev):
                pk, pl, ps, pm, pn = prev[p]
                nk, nl, ns = res[p]
                if ns < mc.min_intv and (pn - pm + 1) >= mc.min_seed:
                    mc.out.append(Smem(pm, pn + 1, pk, ps))
                    p += 1
                    break
                if ns >= mc.min_intv and ns != curr_s:
                    curr_s = ns
                    curr.append((nk, nl, ns, mc.j, pn))
                    p += 1
                    break
                p += 1
            while p < len(prev):
                pk, pl, ps, pm, pn = prev[p]
                nk, nl, ns = res[p]
                if ns >= mc.min_intv and ns != curr_s:
                    curr_s = ns
                    curr.append((nk, nl, ns, mc.j, pn))
                p += 1
            mc.prev = curr
            if not mc.prev:
                mc.phase = DONE
            elif mc.j == 0:
                self._finalize(mc)
            else:
                mc.j -= 1

    def _new_machine(self, read, codes, x, min_intv, min_seed, phase, out):
        a = int(codes[x])
        if a >= 4:
            return None
        k, l, s = self._init_intv(a)
        return _Machine(read, codes, x, min_intv, min_seed, k, l, s, phase, out)

    # ------------------------------------------------------------ interface
    def collect_smems_batch(self, codes_list) -> list[list[Smem]]:
        opt = self.opt
        R = len(codes_list)
        codes_list = [np.minimum(c, 4) for c in codes_list]
        outs: list[list[Smem]] = [[] for _ in range(R)]

        # ---- round 1: all-pos sweeps, all reads in lockstep
        cursors = [0] * R
        while True:
            machines = []
            for i in range(R):
                while cursors[i] < len(codes_list[i]):
                    x = cursors[i]
                    mc = self._new_machine(i, codes_list[i], x, 1,
                                           opt.min_seed_len, FWD, outs[i])
                    if mc is None:
                        cursors[i] = x + 1
                        continue
                    machines.append(mc)
                    break
            if not machines:
                break
            self._run_machines(machines)
            for mc in machines:
                cursors[mc.read] = mc.next_x

        # ---- round 2: re-seed long/rare SMEMs at their midpoint
        jobs = []
        for i in range(R):
            for sm in list(outs[i]):
                if (sm.end - sm.start) < opt.split_len or sm.hitcount > opt.split_width:
                    continue
                piv = (sm.start + sm.end) >> 1
                mc = self._new_machine(i, codes_list[i], piv, sm.hitcount + 1,
                                       opt.min_seed_len, FWD, outs[i])
                if mc is not None:
                    jobs.append(mc)
        if jobs:
            self._run_machines(jobs)

        # ---- round 3: bwt seed strategy (forward-only sweeps)
        if opt.max_mem_intv > 0:
            cursors = [0] * R
            while True:
                machines = []
                for i in range(R):
                    while cursors[i] < len(codes_list[i]):
                        x = cursors[i]
                        mc = self._new_machine(i, codes_list[i], x,
                                               opt.max_mem_intv,
                                               opt.min_seed_len + 1, FWD3,
                                               outs[i])
                        if mc is None:
                            cursors[i] = x + 1
                            continue
                        machines.append(mc)
                        break
                if not machines:
                    break
                self._run_machines(machines)
                for mc in machines:
                    cursors[mc.read] = mc.next_x
            # NOTE: a read whose pivot has a<4 but no j-loop entry advances
            # by 1 via next_x init in _Machine.
        return outs

    def sorted_smems_batch(self, codes_list):
        res = self.collect_smems_batch(codes_list)
        return [sorted(sm, key=lambda s: (s.start, s.end)) for sm in res]

    def sorted_smems(self, codes):
        return self.sorted_smems_batch([codes])[0]
