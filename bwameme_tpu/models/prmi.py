"""P-RMI: partitioned learned index over the suffix-array key space.

Replaces the reference's offline Rust trainer (reference: RMI/src/main.rs,
RMI/rmi_lib/) and its 3-layer ``pwl{B},linear,linear_spline`` model
(reference: build_rmis_dna.sh:119, src/LearnedIndex_seeding.cpp:74-210) with a
TPU-friendly design:

* layer 0: radix partition by the top ``bits`` key bits (same as the
  reference's ``pwl`` layer, rmi_lib/src/models/piecewiselinear.rs:23-28).
* layer 1: per-leaf monotone linear model over the *recentred* key
  (``key - leaf_base``), fitted by least squares. Recentring keeps the
  per-leaf prediction in small-magnitude float32 range so the TPU VPU can
  evaluate it exactly enough — the analog of the reference's float64
  {alpha,beta} records but without needing f64 emulation on device.
* guaranteed integer error bounds: the device search window
  ``[pred-err_lo, pred+err_hi]`` provably contains the lower-bound insertion
  index of *any* query key mapping to the leaf (monotone model + clamping to
  the leaf's index range + endpoint residuals + safety margin), replacing the
  reference's unbounded linear-walk fallback
  (src/LearnedIndex_seeding.cpp:2262-2350) with a fixed-iteration,
  TPU-schedulable search.

Training is a fully vectorized segment-reduction — runs in numpy/JAX in
seconds even for a human-genome SA (the reference's Rust trainer takes ~15
min single-threaded, README.md:75-77).
"""

from __future__ import annotations

import numpy as np


def train_prmi(idx, bits: int, margin: int = 2) -> None:
    """Fit the P-RMI over idx.key_hi/key_lo (sorted); fills idx.rmi_* fields."""
    key_hi = idx.key_hi
    key_lo = idx.key_lo
    n = len(key_hi)
    n_leaves = 1 << bits
    shift = np.uint32(32 - bits)
    leaf_of = (key_hi >> shift).astype(np.int64)

    # leaf boundaries in the sorted key array
    leaf_start = np.searchsorted(leaf_of, np.arange(n_leaves + 1), side="left")
    leaf_start = leaf_start.astype(np.int64)
    cnt = np.diff(leaf_start)

    # recentred keys: rel = (key_hi & mask)*2^32 + key_lo, computed exactly in f64
    mask = np.uint32((1 << (32 - bits)) - 1) if bits < 32 else np.uint32(0)
    rel = (key_hi & mask).astype(np.float64) * 4294967296.0 + key_lo.astype(np.float64)
    y = np.arange(n, dtype=np.float64) - leaf_start[leaf_of].astype(np.float64)

    # per-leaf least squares via segment sums
    ends = leaf_start[1:]
    starts = leaf_start[:-1]
    def segsum(v):
        c = np.concatenate([[0.0], np.cumsum(v)])
        return c[ends] - c[starts]

    s1 = cnt.astype(np.float64)
    sx = segsum(rel)
    sy = segsum(y)
    sxx = segsum(rel * rel)
    sxy = segsum(rel * y)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = sxx - sx * sx / np.maximum(s1, 1)
        cov = sxy - sx * sy / np.maximum(s1, 1)
        beta = np.where(var > 0, cov / np.maximum(var, 1e-300), 0.0)
        beta = np.maximum(beta, 0.0)  # monotone model: required for bound proof
        alpha = np.where(s1 > 0, (sy - beta * sx) / np.maximum(s1, 1), 0.0)

    alpha32 = alpha.astype(np.float32)
    beta32 = beta.astype(np.float32)

    # residual bounds, evaluated with the same f32 arithmetic the device uses
    rel32 = (key_hi & mask).astype(np.float32) * np.float32(4294967296.0) + key_lo.astype(np.float32)
    predf = alpha32[leaf_of] + beta32[leaf_of] * rel32
    cnt_f = cnt.astype(np.float32)
    predf = np.clip(predf, 0.0, cnt_f[leaf_of])
    pred_i = leaf_start[leaf_of] + predf.astype(np.int64)

    i_arr = np.arange(n, dtype=np.int64)
    over = pred_i - i_arr   # how far prediction overshoots the true index
    under = i_arr - pred_i

    # segment maxima: leaf_of is sorted (keys are sorted), so the nonempty
    # leaves' segments tile the array — maximum.reduceat over their starts
    # (np.maximum.at is ~50x slower)
    err_lo = np.zeros(n_leaves, dtype=np.int64)
    err_hi = np.zeros(n_leaves, dtype=np.int64)
    ne = np.flatnonzero(cnt > 0)
    if len(ne):
        err_lo[ne] = np.maximum.reduceat(over, leaf_start[ne])
        err_hi[ne] = np.maximum.reduceat(under, leaf_start[ne])
    err_lo = np.maximum(err_lo, 0) + margin
    err_hi = np.maximum(err_hi, 0) + 1 + margin

    idx.rmi_bits = bits
    idx.rmi_alpha = alpha32
    idx.rmi_beta = beta32
    idx.rmi_err_lo = err_lo.astype(np.int32)
    idx.rmi_err_hi = err_hi.astype(np.int32)
    idx.rmi_leaf_start = leaf_start.astype(np.int64)


def predict_np(idx, key_hi: np.ndarray, key_lo: np.ndarray):
    """Host-side reference of the device prediction: returns (lo, hi_excl)
    window guaranteed to contain lower_bound(key)."""
    bits = idx.rmi_bits
    shift = np.uint32(32 - bits)
    mask = np.uint32((1 << (32 - bits)) - 1) if bits < 32 else np.uint32(0)
    leaf = (key_hi >> shift).astype(np.int64)
    rel32 = (key_hi & mask).astype(np.float32) * np.float32(4294967296.0) + key_lo.astype(np.float32)
    ls = idx.rmi_leaf_start
    cnt = (ls[leaf + 1] - ls[leaf]).astype(np.float32)
    predf = np.clip(idx.rmi_alpha[leaf] + idx.rmi_beta[leaf] * rel32, 0.0, cnt)
    pred = ls[leaf] + predf.astype(np.int64)
    lo = np.maximum(pred - idx.rmi_err_lo[leaf], 0)
    hi = np.minimum(pred + idx.rmi_err_hi[leaf], idx.n_sa)
    return lo, hi
