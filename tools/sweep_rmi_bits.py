"""Sweep P-RMI leaf counts (rmi_bits) on the real chip: more leaves ->
narrower error windows -> fewer unrolled binary-search rounds per probe
(lb_rounds = ceil(log2(max_err+1)), ops/sa_search.py), at the cost of a
bigger replicated parameter plane (24 B/leaf). The reference picks 2^28
for human (build_rmis_dna.sh:64-109); this measures what the TPU engine's
probe structure wants.

Usage: python tools/sweep_rmi_bits.py [--bits 25,26,27] [--mbp 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench_cache/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", default="25,26,27")
    ap.add_argument("--mbp", default="100")
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    os.environ["BWAMEME_BENCH_MBP"] = args.mbp

    import bench
    from bwameme_tpu.models.prmi import train_prmi
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    reads = bench.make_reads(idx, np.random.default_rng(7))
    bs = args.batch

    # ONE engine; only the (replicated) fused parameter plane is swapped
    # per bits value, so the 6+ GB suffix planes upload once.
    import dataclasses

    import jax
    import jax.numpy as jnp

    eng = None
    ref_counts = None
    for bits in [int(b) for b in args.bits.split(",")]:
        t0 = time.time()
        if bits != idx.rmi_bits:
            train_prmi(idx, bits)
        log(f"bits={bits}: trained {time.time()-t0:.1f}s "
            f"max_err={idx.max_err} params={(1 << bits) * 24 / 1e9:.2f} GB")
        if eng is None:
            t0 = time.time()
            eng = DeviceSeedingEngine(idx, opt, lanes=bs)
            log(f"engine (planes upload): {time.time()-t0:.1f}s")
        else:
            from bwameme_tpu.ops import sa_search as ss

            ls = np.asarray(idx.rmi_leaf_start, np.int64)
            L = len(ls) - 1
            p = np.empty((L, 6), np.uint32)
            p[:, 0] = ls[:-1].astype(np.uint32)
            p[:, 1] = ls[1:].astype(np.uint32)
            p[:, 2] = np.asarray(idx.rmi_alpha, np.float32).view(np.uint32)
            p[:, 3] = np.asarray(idx.rmi_beta, np.float32).view(np.uint32)
            p[:, 4] = np.asarray(idx.rmi_err_lo, np.uint32)
            p[:, 5] = np.asarray(idx.rmi_err_hi, np.uint32)
            eng.di = dataclasses.replace(
                eng.di, params=jax.device_put(p), bits=bits)
            eng._tiers.clear()
            eng._activate_tier(160)
        batch = reads[:bs]
        t0 = time.time()
        f = eng.sorted_smems_batch_flat(batch)
        log(f"bits={bits}: warmup+compile {time.time()-t0:.1f}s")
        n = len(f.start) if f is not None else -1
        if ref_counts is None:
            ref_counts = n
        assert n == ref_counts, (n, ref_counts)  # same SMEMs regardless
        t0 = time.time()
        reps = max(1, 8192 // bs)
        for r in range(reps):
            eng.sorted_smems_batch_flat(reads[r * bs:(r + 1) * bs])
        dt = time.time() - t0
        log(f"bits={bits}: steady {bs*reps/dt:.0f} reads/s")


if __name__ == "__main__":
    main()
