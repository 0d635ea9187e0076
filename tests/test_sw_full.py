"""Batched full-SW (kswv analog) vs the scalar ksw contract."""

import numpy as np
import pytest

from bwameme_tpu.align.sw_scalar import sw_align
from bwameme_tpu.ops.sw_full import align_batch
from bwameme_tpu.utils.config import MemOptions

OPT = MemOptions()


def rand_pairs(rng, n, qmax=100, tmax=300):
    pairs = []
    for _ in range(n):
        t = rng.integers(0, 4, int(rng.integers(50, tmax))).astype(np.int32)
        # query = mutated window of the target
        st = int(rng.integers(0, max(1, len(t) - qmax)))
        q = t[st: st + int(rng.integers(20, qmax))].copy()
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, len(q)))
            q[p] = (q[p] + rng.integers(1, 4)) % 4
        pairs.append((q, t))
    return pairs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    pairs = rand_pairs(rng, 25)
    got = align_batch(pairs, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                      OPT.e_ins, min_sc=19)
    for (q, t), g in zip(pairs, got):
        ref = sw_align(q, t, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                       OPT.e_ins, xtra_start=True, min_sc=19)
        assert g["score"] == ref.score, (g, ref)
        assert g["te"] == ref.te and g["qe"] == ref.qe, (g, ref)
        assert g["score2"] == ref.score2, (g, ref)
        assert g["tb"] == ref.tb and g["qb"] == ref.qb, (g, ref)


def test_random_noise_pairs():
    rng = np.random.default_rng(9)
    pairs = [
        (rng.integers(0, 4, 40).astype(np.int32),
         rng.integers(0, 4, 120).astype(np.int32))
        for _ in range(20)
    ]
    got = align_batch(pairs, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                      OPT.e_ins)
    for (q, t), g in zip(pairs, got):
        ref = sw_align(q, t, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                       OPT.e_ins, xtra_start=True, min_sc=0)
        assert g["score"] == ref.score
        assert (g["te"], g["qe"]) == (ref.te, ref.qe)
