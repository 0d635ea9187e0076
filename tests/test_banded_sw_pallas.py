"""Differential test: the Pallas banded-SW kernel (interpret mode on the CPU
suite) must be bit-identical to the XLA kernel, which itself is tested
against the scalar contract in test_banded_sw.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from bwameme_tpu.ops.banded_sw import banded_sw_extend_batch
from bwameme_tpu.ops.banded_sw_pallas import banded_sw_extend_batch_pallas
from bwameme_tpu.utils.config import MemOptions


@pytest.mark.parametrize("seed,B,Q,T,zdrop", [
    (1, 16, 100, 200, 100),
    (2, 24, 64, 128, 0),     # z-drop disabled
    (3, 9, 128, 256, 25),    # aggressive z-drop, non-tile batch
])
def test_pallas_matches_xla(seed, B, Q, T, zdrop):
    opt = MemOptions()
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 5, (B, Q)).astype(np.int32)   # incl. N codes
    t = rng.integers(0, 5, (B, T)).astype(np.int32)
    for b in range(0, B, 2):  # realistic extensions: noisy copies
        t[b, :Q] = q[b]
        for _ in range(rng.integers(0, 8)):
            t[b, rng.integers(0, Q)] = rng.integers(0, 4)
    qlen = rng.integers(10, Q + 1, B).astype(np.int32)
    tlen = rng.integers(10, T + 1, B).astype(np.int32)
    h0 = rng.integers(1, 80, B).astype(np.int32)
    ws = rng.integers(3, 60, B).astype(np.int32)
    mat = opt.mat.astype(np.int32)
    args = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
            jnp.asarray(tlen), jnp.asarray(h0), jnp.asarray(ws),
            jnp.asarray(mat), opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            5, zdrop)
    a = banded_sw_extend_batch(*args)
    b_ = banded_sw_extend_batch_pallas(*args, interpret=True)
    for k in a:
        assert np.array_equal(np.asarray(a[k]), np.asarray(b_[k])), k
