import numpy as np
import pytest

from bwameme_tpu.index import suffix_array as sa_mod


def naive_sa(text: np.ndarray) -> np.ndarray:
    s = bytes(text.tolist())
    return np.array(sorted(range(len(s)), key=lambda i: s[i:]), dtype=np.int64)


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (10, 2), (100, 3), (1000, 4), (5000, 5)])
def test_doubling_vs_naive(n, seed):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, n).astype(np.uint8)
    assert np.array_equal(sa_mod.build_suffix_array_doubling(text), naive_sa(text))


@pytest.mark.parametrize("n,seed", [(1, 0), (10, 2), (100, 3), (1000, 4), (20000, 6)])
def test_native_vs_naive(n, seed):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, n).astype(np.uint8)
    sa = sa_mod.build_suffix_array_native(text)
    if sa is None:
        pytest.skip("no native toolchain")
    assert np.array_equal(sa, naive_sa(text))


def test_native_repetitive():
    # repetitive texts stress the recursion / LMS naming path
    text = np.array(([0, 1] * 500) + ([3] * 100) + ([0] * 50) + ([2, 2, 1] * 77), dtype=np.uint8)
    sa = sa_mod.build_suffix_array_native(text)
    if sa is None:
        pytest.skip("no native toolchain")
    assert np.array_equal(sa, naive_sa(text))


def test_native_large_random():
    rng = np.random.default_rng(42)
    text = rng.integers(0, 4, 300_000).astype(np.uint8)
    sa = sa_mod.build_suffix_array_native(text)
    if sa is None:
        pytest.skip("no native toolchain")
    # spot-check sortedness on a sample + doubling cross-check
    assert np.array_equal(sa, sa_mod.build_suffix_array_doubling(text))
