import numpy as np
import pytest

from bwameme_tpu.index import packing


def test_seq_code_roundtrip():
    s = "ACGTACGTNNacgt"
    c = packing.seq_to_code(s)
    assert list(c) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 0, 1, 2, 3]
    assert packing.code_to_seq(c) == "ACGTACGTNNACGT"


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 16, 17, 100])
def test_pac_roundtrip(n):
    rng = np.random.default_rng(n)
    code = rng.integers(0, 4, n).astype(np.uint8)
    pac = packing.pack_pac(code)
    assert np.array_equal(packing.unpack_pac(pac, n), code)


@pytest.mark.parametrize("n", [1, 15, 16, 17, 64, 100])
def test_words_roundtrip(n):
    rng = np.random.default_rng(n)
    code = rng.integers(0, 4, n).astype(np.uint8)
    w = packing.pack_words(code)
    assert np.array_equal(packing.unpack_words(w, n), code)


def test_words_lexicographic():
    # word comparison == lexicographic comparison of the 16 bases
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = rng.integers(0, 4, 16).astype(np.uint8)
        b = rng.integers(0, 4, 16).astype(np.uint8)
        wa = packing.pack_words(a)[0]
        wb = packing.pack_words(b)[0]
        la = list(a)
        lb = list(b)
        assert (wa < wb) == (la < lb)
        assert (wa == wb) == (la == lb)


def test_extract_key64():
    rng = np.random.default_rng(7)
    code = rng.integers(0, 4, 100).astype(np.uint8)
    pos = np.array([0, 1, 50, 80, 99])
    keys = packing.extract_key64(code, pos)
    for p, k in zip(pos, keys):
        expect = 0
        for i in range(32):
            c = int(code[p + i]) if p + i < 100 else 3
            expect = (expect << 2) | c
        assert int(k) == expect


def test_lower_bound_round_count_exact():
    """ceil(log2(W+1)) halving rounds converge an exclusive-window binary
    search for every window width and insertion point (the static unroll
    count used by ops/sa_search.make_search_fns and the sharded search)."""
    import math

    for W in list(range(0, 70)) + [127, 128, 129, 1023, 1024]:
        rounds = max(1, int(math.ceil(math.log2(W + 1))) if W else 1)
        for target in range(W + 1):
            lo, hi = 0, W
            for _ in range(rounds):
                if lo < hi:
                    mid = (lo + hi) >> 1
                    if mid < target:
                        lo = mid + 1
                    else:
                        hi = mid
            assert lo == hi == target
