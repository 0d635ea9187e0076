"""Seeding profiler: stage breakdown + batch-size sweep on the real chip.

Usage (from /root/repo):
    python tools/profile_seed.py [--batches 2048,4096] [--mode 4] [--root prmi]

Loads the cached bench index, then for each batch size:
  * per-dispatch device time (block_until_ready between rounds):
    prep / step1 / step2 / step3 / pack+transfer;
  * steady-state collect throughput (reads/s).
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
    ap.add_argument("--batches", default="2048,4096")
    ap.add_argument("--mode", type=int, default=None)
    ap.add_argument("--root", default="prmi")
    ap.add_argument("--mbp", default=os.environ.get("BWAMEME_BENCH_MBP", "8"))
    args = ap.parse_args()
    os.environ["BWAMEME_BENCH_MBP"] = args.mbp

    import jax
    log(f"devices: {jax.devices()}")

    import bench
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)
    log(f"index n_sa={idx.n_sa} bits={idx.rmi_bits}; {len(reads)} reads")

    for bs in [int(x) for x in args.batches.split(",")]:
        kw = {}
        if args.root == "kmer":
            kw = {"root": "kmer", "ert_bits": 0}
        eng = DeviceSeedingEngine(idx, opt, lanes=bs, mode=args.mode, **kw)
        batch = (reads * ((bs // len(reads)) + 1))[:bs]
        log(f"--- batch={bs} mode={args.mode} root={args.root}: warmup ---")
        t0 = time.time()
        eng.sorted_smems_batch_flat(batch)
        log(f"warmup+compile {time.time()-t0:.1f}s")

        # stage breakdown with device syncs between dispatches
        import jax.numpy as jnp
        t0 = time.time()
        mat, _rcm, lens_np, maxlen = eng._batch_matrix(batch)
        eng._select_tier(maxlen)
        lens = jnp.asarray(lens_np.astype(np.int32))
        d = eng._prep_dev(jnp.asarray(mat), lens)
        jax.block_until_ready(d)
        qbuf, nf, nr, nvf = d
        t_prep = time.time() - t0

        M, M2 = eng.max_smems, 16
        t0 = time.time()
        d1 = eng._fused_step1(eng.di, qbuf, nf, nr, nvf, lens,
                              jnp.int32(opt.min_seed_len), M=M)
        jax.block_until_ready(d1)
        t1 = time.time() - t0
        t0 = time.time()
        d2 = eng._fused_step2(eng.di, qbuf, nf, nr, lens, d1[0][0], d1[0][1],
                              d1[0][3], d1[1], jnp.int32(opt.split_len),
                              jnp.int32(opt.split_width),
                              jnp.int32(opt.min_seed_len), M1=M, M2=M2)
        jax.block_until_ready(d2)
        t2 = time.time() - t0
        t0 = time.time()
        d3 = eng._fused_step3(eng.di, qbuf, nf, lens,
                              jnp.int32(opt.max_mem_intv),
                              jnp.int32(opt.min_seed_len + 1), M=M)
        jax.block_until_ready(d3)
        t3 = time.time() - t0
        t0 = time.time()
        packed = eng._pack([d1, d2, d3], len(batch) * eng.pack_cap_per_read)
        if isinstance(packed, tuple):
            np.asarray(packed[0]); np.asarray(packed[1])
        else:
            np.asarray(packed)
        t4 = time.time() - t0
        log(f"stages: prep {t_prep:.3f} step1 {t1:.3f} step2 {t2:.3f} "
            f"step3 {t3:.3f} pack+xfer {t4:.3f} "
            f"TOTAL {t_prep+t1+t2+t3+t4:.3f}s")

        # steady-state (pipelined dispatch, like bench.py)
        n_rep = max(1, 8192 // bs)
        t0 = time.time()
        for _ in range(n_rep):
            eng.sorted_smems_batch_flat(batch)
        dt = time.time() - t0
        log(f"steady-state: {bs*n_rep/dt:.0f} reads/s (batch={bs})")


if __name__ == "__main__":
    main()
