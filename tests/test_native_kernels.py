"""Native C++ host kernels vs the Python reference contracts."""

import numpy as np
import pytest

from bwameme_tpu.align import native
from bwameme_tpu.align.sw_scalar import sw_extend, sw_global
from bwameme_tpu.utils.config import MemOptions

OPT = MemOptions()

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sw_global_native_matches(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        t = rng.integers(0, 4, int(rng.integers(20, 200))).astype(np.uint8)
        q = t.copy()
        # mutations + a small indel
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(q)))
            q[p] = (q[p] + rng.integers(1, 4)) % 4
        if rng.random() < 0.5 and len(q) > 20:
            cut = int(rng.integers(5, len(q) - 5))
            ln = int(rng.integers(1, 4))
            q = np.concatenate([q[:cut], q[cut + ln:]])
        w = int(rng.choice([10, 50, 100]))
        ref_score, ref_cig = sw_global(q, t, OPT.mat, OPT.o_del, OPT.e_del,
                                       OPT.o_ins, OPT.e_ins, w)
        got = native.sw_global_native(q, t, OPT.mat, OPT.o_del, OPT.e_del,
                                      OPT.o_ins, OPT.e_ins, w)
        assert got is not None
        assert got[0] == ref_score
        assert got[1] == ref_cig


@pytest.mark.parametrize("seed", [0, 1])
def test_sw_extend_native_matches(seed):
    rng = np.random.default_rng(seed + 10)
    for _ in range(25):
        q = rng.integers(0, 4, int(rng.integers(10, 120))).astype(np.uint8)
        t = rng.integers(0, 4, int(rng.integers(10, 150))).astype(np.uint8)
        if rng.random() < 0.6:
            n = min(len(q), len(t))
            t[:n] = q[:n]  # make them extend
        h0 = int(rng.integers(1, 60))
        w = int(rng.choice([5, 20, 100]))
        ref = sw_extend(q, t, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                        OPT.e_ins, w, 5, OPT.zdrop, h0)
        out = native.sw_extend_native(q, t, OPT.mat, OPT.o_del, OPT.e_del,
                                      OPT.o_ins, OPT.e_ins, w, 5, OPT.zdrop, h0)
        assert out is not None
        assert (
            [ref.score, ref.qle, ref.tle, ref.gtle, ref.gscore, ref.max_off]
            == out.tolist()
        )
