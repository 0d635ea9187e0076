"""Differential tests of the host seeding engine against a brute-force
definitional SMEM oracle (the compare_result.sh pattern of the reference,
test/compare_result.sh:6-19)."""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils.config import MemOptions


def make_engine(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code)
    idx = build_index(bns, rmi_bits=8)
    return HostSeedingEngine(idx, MemOptions()), idx, rng


def brute_smems(engine, codes, min_seed_len):
    """Definitional SMEMs: for each start s (non-N), the maximal match
    [s, s+m(s)) where m(s) = max LCP of read[s:] (N-clipped) over all
    suffixes; keep containment-free intervals of length >= min_seed_len."""
    l = len(codes)
    next_n = HostSeedingEngine._next_n(codes)
    intervals = []
    for s in range(l):
        if codes[s] >= 4:
            continue
        pat = codes[s: next_n[s]]
        if len(pat) == 0:
            continue
        m = engine.find_longest(pat)
        if m > 0:
            intervals.append((s, s + m))
    # containment-free
    keep = []
    for iv in intervals:
        if not any(
            (o[0] <= iv[0] and iv[1] <= o[1] and o != iv) for o in intervals
        ):
            keep.append(iv)
    keep = sorted(set(keep))
    return [iv for iv in keep if iv[1] - iv[0] >= min_seed_len]


def ref_interval(engine, codes, s, e):
    pat = codes[s:e]
    return engine.interval_at(pat, e - s)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_step1_matches_brute_smems(seed):
    engine, idx, rng = make_engine(seed=seed)
    opt = engine.opt
    # sample reads from the reference with mutations
    for trial in range(8):
        start = int(rng.integers(0, idx.l_pac - 120))
        codes = idx.text[start: start + 100].copy()
        nmut = int(rng.integers(0, 4))
        for _ in range(nmut):
            p = int(rng.integers(0, 100))
            codes[p] = (codes[p] + rng.integers(1, 4)) % 4
        # step-1 only: disable rounds 2/3 influence by filtering emissions
        smems = engine.collect_smems(codes)
        # reconstruct pure step-1 SMEMs as containment-free brute set
        brute = brute_smems(engine, codes, opt.min_seed_len)
        got = sorted({(s.start, s.end) for s in smems if (s.end - s.start) >= opt.min_seed_len})
        # every brute SMEM must be present in the engine's emissions
        for iv in brute:
            assert iv in got, (trial, iv, got)
        # and every step-1-style emission with hitcount from interval_at must
        # carry the exact SA interval
        for s in smems:
            if (s.start, s.end) in brute:
                lb, cnt = ref_interval(engine, codes, s.start, s.end)
                assert (s.sa_lo, s.hitcount) == (lb, cnt)


def test_smems_on_read_with_n():
    engine, idx, rng = make_engine(seed=3)
    codes = idx.text[100:200].copy()
    codes[40] = 4  # N splits the read
    smems = engine.collect_smems(codes)
    for s in smems:
        assert not np.any(codes[s.start: s.end] >= 4), (s.start, s.end)


def test_exact_read_one_hit():
    engine, idx, rng = make_engine(seed=4)
    codes = idx.text[500:600].copy()
    smems = engine.collect_smems(codes)
    # the full read matches somewhere (at least at its own locus)
    full = [s for s in smems if s.end - s.start == 100]
    assert full, smems
    hit_positions = [int(engine.sa[s.sa_lo + i]) for s in full for i in range(s.hitcount)]
    assert 500 in hit_positions


def test_sa_query_widening():
    engine, idx, rng = make_engine(seed=5)
    # take a pattern and ask for a big interval: length must shrink, count grow
    pat = idx.text[1000:1030]
    l1, lo1, c1 = engine.sa_query(pat, 1)
    l2, lo2, c2 = engine.sa_query(pat, 20)
    assert l2 <= l1
    assert c2 >= 20
    # all interval members really match to the reported length
    for i in range(min(c2, 25)):
        assert engine._lcp(lo2 + i, pat[:l2]) == l2
