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


# --------------------------------------------------------------------------
# Property test of the window guarantee at PRODUCTION shapes (VERDICT #10):
# every search result in the system rests on train_prmi's claim that the
# true lower bound of ANY query key (present or absent) lies inside
# [pred - err_lo, pred + err_hi]. The small-index tests above exercise
# bits 8-11; the bench/production indexes run at bits 20-24 where float32
# rel precision and per-leaf key skew are a different regime. Here the
# trainer is driven directly with adversarial sorted key sets.
# --------------------------------------------------------------------------

def _mk_keys(kind: str, n: int, rng) -> np.ndarray:
    """Sorted uint64 key arrays with adversarial shapes."""
    if kind == "uniform":
        k = rng.integers(0, 1 << 63, n).astype(np.uint64) << np.uint64(1)
    elif kind == "duplicates":
        # poly-A-style repeat pileups: few distinct keys, huge multiplicity
        base = rng.integers(0, 1 << 62, max(n // 512, 4)).astype(np.uint64)
        k = rng.choice(base, n).astype(np.uint64) << np.uint64(2)
    elif kind == "clustered":
        # dense clusters (segmental duplications): normal blobs around
        # a handful of centers, plus a uniform background
        nc = 32
        centers = rng.integers(0, 1 << 63, nc).astype(np.float64)
        which = rng.integers(0, nc, n)
        k = centers[which] + rng.normal(0.0, 1e6, n)
        k = np.clip(k, 0, float((1 << 63) - 1)).astype(np.uint64) << np.uint64(1)
        bg = rng.integers(0, 1 << 63, n // 16).astype(np.uint64) << np.uint64(1)
        k = np.concatenate([k[: n - len(bg)], bg])
    elif kind == "lowbits":
        # float32-rel precision stress: keys agree in the top bits (one
        # leaf at bits<=24) and differ only below the f32 mantissa
        hi = np.uint64(0x3FC0_0000) << np.uint64(32)
        k = hi | rng.integers(0, 1 << 20, n).astype(np.uint64)
    elif kind == "geometric":
        # exponentially spaced keys: worst case for one linear per leaf
        u = rng.random(n)
        k = (np.exp(u * 43.0)).astype(np.uint64) << np.uint64(8)
    else:
        raise AssertionError(kind)
    k.sort(kind="stable")
    return k


@pytest.mark.parametrize("kind", ["uniform", "duplicates", "clustered",
                                  "lowbits", "geometric"])
@pytest.mark.parametrize("bits", [20, 24])
def test_prmi_window_guarantee_production_shapes(kind, bits):
    from types import SimpleNamespace

    from bwameme_tpu.models.prmi import train_prmi

    rng = np.random.default_rng(hash((kind, bits)) & 0xFFFF)
    n = 1 << 18  # keys; kept modest so the suite stays fast on a 1-vCPU host
    keys = _mk_keys(kind, n, rng)
    fake = SimpleNamespace(
        key_hi=(keys >> np.uint64(32)).astype(np.uint32),
        key_lo=(keys & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        n_sa=n,
    )
    train_prmi(fake, bits=bits)
    assert fake.rmi_bits == bits

    # queries: every present key, perturbed neighbours, uniform absents,
    # and exact leaf-boundary keys (rel == 0 after recentring)
    qs = [keys,
          keys[rng.integers(0, n, n // 4)] + rng.integers(-3, 4, n // 4).astype(np.uint64),
          rng.integers(0, 1 << 63, n // 4).astype(np.uint64) << np.uint64(1),
          (rng.integers(0, 1 << bits, 4096).astype(np.uint64)
           << np.uint64(64 - bits))]
    q = np.concatenate(qs)
    qh = (q >> np.uint64(32)).astype(np.uint32)
    ql = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lo, hi = predict_np(fake, qh, ql)
    lb = np.searchsorted(keys, q, side="left")
    bad = (lo > lb) | (lb > hi)
    assert not bad.any(), (
        f"{kind}/bits={bits}: {bad.sum()} of {len(q)} query windows miss "
        f"the true lower bound (first: q={q[bad][0]:#x}, lb={lb[bad][0]}, "
        f"window=[{lo[bad][0]}, {hi[bad][0]}])")
    # windows must also be finite/sane: hard cap well under the search's
    # fixed-round budget assumption
    width = np.asarray(fake.rmi_err_lo, np.int64) + np.asarray(
        fake.rmi_err_hi, np.int64)
    assert width.max() < n
