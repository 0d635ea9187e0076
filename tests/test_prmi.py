import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.models.prmi import predict_np


def make_index(n=20000, seed=0, bits=10):
    rng = np.random.default_rng(seed)
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code)
    return build_index(bns, rmi_bits=bits)


@pytest.fixture(scope="module")
def idx():
    return make_index()


def test_index_shapes(idx):
    n = idx.n_sa
    assert n == 2 * idx.l_pac
    assert len(idx.key_hi) == n and len(idx.key_lo) == n
    # keys sorted (they are 32-base prefixes of sorted suffixes)
    k = idx.key_hi.astype(np.uint64) << np.uint64(32) | idx.key_lo.astype(np.uint64)
    assert np.all(k[:-1] <= k[1:])
    # ISA is the inverse permutation
    assert np.array_equal(idx.sa[idx.isa], np.arange(n))


def test_prmi_window_contains_present_keys(idx):
    k = idx.key_hi.astype(np.uint64) << np.uint64(32) | idx.key_lo.astype(np.uint64)
    lo, hi = predict_np(idx, idx.key_hi, idx.key_lo)
    lb = np.searchsorted(k, k, side="left")
    assert np.all(lo <= lb)
    assert np.all(lb <= hi)


def test_prmi_window_contains_absent_keys(idx):
    rng = np.random.default_rng(1)
    q = rng.integers(0, 1 << 63, 5000).astype(np.uint64) * np.uint64(2)
    k = idx.key_hi.astype(np.uint64) << np.uint64(32) | idx.key_lo.astype(np.uint64)
    qh = (q >> np.uint64(32)).astype(np.uint32)
    ql = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lo, hi = predict_np(idx, qh, ql)
    lb = np.searchsorted(k, q, side="left")
    assert np.all(lo <= lb)
    assert np.all(lb <= hi)


def test_prmi_error_reasonable(idx):
    # learned index should give tight windows on random DNA
    assert idx.max_err < 256
