"""Attribute the tunnel's DEGRADED-GATHER trigger: pack program vs
device->host fetch (ARCHITECTURE.md round-5 finding; bisect19 narrowed it
to "pack+fetch" but not which half).

Each mode is run in a FRESH process (the state is per-process and
persistent).  Measures the dependent-gather round-trip (healthy ~1-2 us,
degraded ~15-300 us) BEFORE and AFTER the candidate trigger:

  steps        fused steps 1-3 only (control; known healthy after)
  pack         + the pack program, device-side only (no host fetch)
  pack-nosort  + pack with BWAMEME_PACK_NOSORT semantics (no lexsort)
  fetch        + np.asarray of the packed buffer (the production fetch)
  fetch-other  steps, then fetch a device-GENERATED buffer of packed size
  fetch-tiny   steps, then fetch 16 KB of the packed buffer only

Usage: python tools/bisect_degraded.py MODE [mbp] [lanes]
Writes one JSON line to stdout.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".bench_cache",
                                              "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def gather_health(di):
    import jax
    import jax.numpy as jnp

    n_sa = di.n_sa
    K = 30
    src = di.rk if di.rk is not None else di.sa

    @jax.jit
    def chain(t, x0):
        def body(k, st):
            acc, x = st
            r0 = jnp.take(t, jnp.clip(x, 0, n_sa - 1), axis=0, mode="clip")
            w = (r0[..., 1] if r0.ndim > 1 else r0).astype(jnp.int32)
            x = jax.lax.rem(x * jnp.int32(1103515245) + w, jnp.int32(n_sa))
            x = jnp.where(x < 0, x + n_sa, x)
            return acc ^ w, x
        z = jnp.zeros(4096, jnp.int32)
        return jax.lax.fori_loop(0, K, body, (z, x0))[0]

    x0 = jnp.asarray(
        np.random.default_rng(0).integers(0, n_sa, 4096).astype(np.int32))
    r = jax.block_until_ready(chain(src, x0))
    t0 = time.perf_counter()
    for _ in range(5):
        r = chain(src, x0)
    jax.block_until_ready(r)
    return round((time.perf_counter() - t0) / 5 / K * 1e6, 2)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fetch"
    mbp = float(sys.argv[2]) if len(sys.argv) > 2 else 8
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    os.environ["BWAMEME_BENCH_MBP"] = str(mbp)
    os.environ["BWAMEME_BENCH_READS"] = str(lanes)
    if mode == "pack-nosort":
        os.environ["BWAMEME_PACK_NOSORT"] = "1"
    import bench
    import jax
    import jax.numpy as jnp

    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)[:lanes]
    eng = DeviceSeedingEngine(idx, opt, lanes=lanes)
    out = {"mode": mode, "mbp": mbp, "lanes": lanes}

    # fused steps 1-3, device-side (no pack, no fetch)
    M, M2 = eng.max_smems, 16
    mat, _rcm, lens_np, maxlen = eng._batch_matrix(reads)
    eng._select_tier(maxlen)
    lens = jnp.asarray(lens_np.astype(np.int32))
    qbuf, nf, nr, nvf = jax.block_until_ready(
        eng._prep_dev(jnp.asarray(mat), lens))
    d1 = jax.block_until_ready(eng._fused_step1(
        eng.di, qbuf, nf, nr, nvf, lens, jnp.int32(opt.min_seed_len), M=M))
    d2 = jax.block_until_ready(eng._fused_step2(
        eng.di, qbuf, nf, nr, lens, d1[0][0], d1[0][1], d1[0][3], d1[1],
        jnp.int32(opt.split_len), jnp.int32(opt.split_width),
        jnp.int32(opt.min_seed_len), M1=M, M2=M2))
    d3 = jax.block_until_ready(eng._fused_step3(
        eng.di, qbuf, nf, lens, jnp.int32(opt.max_mem_intv),
        jnp.int32(opt.min_seed_len + 1), M=M))
    out["after_steps_us"] = gather_health(eng.di)

    cap = lanes * eng.pack_cap_per_read
    if mode in ("pack", "pack-nosort", "fetch", "fetch-tiny"):
        packed = jax.block_until_ready(eng._pack([d1, d2, d3], cap))
        out["after_pack_us"] = gather_health(eng.di)
    if mode == "fetch":
        t0 = time.time()
        np.asarray(packed[0] if isinstance(packed, tuple) else packed)
        out["fetch_ms"] = round((time.time() - t0) * 1e3, 1)
        out["after_fetch_us"] = gather_health(eng.di)
    elif mode == "fetch-tiny":
        buf = packed[0] if isinstance(packed, tuple) else packed
        np.asarray(buf[:4096])
        out["after_fetch_us"] = gather_health(eng.di)
    elif mode == "truth":
        # Is the pre-fetch "healthy" state REAL execution speed, or an
        # async-dispatch illusion (block_until_ready not truly waiting)?
        # Real execution scales with K and with FLOPs.
        import jax as _jax

        def chain_k(K):
            di = eng.di
            n_sa = di.n_sa
            src = di.rk if di.rk is not None else di.sa

            @_jax.jit
            def chain(t, x0):
                def body(k, st):
                    acc, x = st
                    r0 = jnp.take(t, jnp.clip(x, 0, n_sa - 1), axis=0,
                                  mode="clip")
                    w = (r0[..., 1] if r0.ndim > 1 else r0).astype(jnp.int32)
                    x = jax.lax.rem(x * jnp.int32(1103515245) + w,
                                    jnp.int32(n_sa))
                    x = jnp.where(x < 0, x + n_sa, x)
                    return acc ^ w, x
                z = jnp.zeros(4096, jnp.int32)
                return jax.lax.fori_loop(0, K, body, (z, x0))[0]

            x0 = jnp.asarray(np.random.default_rng(0).integers(
                0, n_sa, 4096).astype(np.int32))
            r = jax.block_until_ready(chain(src, x0))
            t0 = time.perf_counter()
            for _ in range(5):
                r = chain(src, x0)
            jax.block_until_ready(r)
            return round((time.perf_counter() - t0) / 5 * 1e3, 3)  # ms/call

        @jax.jit
        def flops(a):
            def body(k, x):
                return jnp.tanh(x @ a)
            return jax.lax.fori_loop(0, 64, body, a)

        a = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2048, 2048)).astype(np.float32))
        jax.block_until_ready(flops(a))  # 64 * 2*2048^3 = 1.1 TFLOP
        t0 = time.perf_counter()
        jax.block_until_ready(flops(a))
        out["flops_ms_before"] = round((time.perf_counter() - t0) * 1e3, 1)
        out["chain30_ms_before"] = chain_k(30)
        out["chain300_ms_before"] = chain_k(300)
        packed = jax.block_until_ready(eng._pack([d1, d2, d3], cap))
        buf = packed[0] if isinstance(packed, tuple) else packed
        t0 = time.time()
        np.asarray(buf)
        out["fetch_ms"] = round((time.time() - t0) * 1e3, 1)
        out["chain30_ms_after"] = chain_k(30)
        out["chain300_ms_after"] = chain_k(300)
        t0 = time.perf_counter()
        jax.block_until_ready(flops(a))
        out["flops_ms_after"] = round((time.perf_counter() - t0) * 1e3, 1)
    elif mode == "width":
        # In the TRUE (post-fetch, synchronous) regime: how does the
        # dependent-gather round cost scale with lane width? Latency-bound
        # => widen the engine batch for free throughput.
        packed = jax.block_until_ready(eng._pack([d1, d2, d3], cap))
        np.asarray(packed[0] if isinstance(packed, tuple) else packed)
        di = eng.di
        n_sa = di.n_sa
        src = di.rk if di.rk is not None else di.sa
        res = {}
        for L in (1024, 4096, 16384, 65536):
            @jax.jit
            def chain(t, x0, L=L):
                def body(k, st):
                    acc, x = st
                    r0 = jnp.take(t, jnp.clip(x, 0, n_sa - 1), axis=0,
                                  mode="clip")
                    w = (r0[..., 1] if r0.ndim > 1 else r0).astype(
                        jnp.int32)
                    x = jax.lax.rem(x * jnp.int32(1103515245) + w,
                                    jnp.int32(n_sa))
                    x = jnp.where(x < 0, x + n_sa, x)
                    return acc ^ w, x
                z = jnp.zeros(L, jnp.int32)
                return jax.lax.fori_loop(0, 64, body, (z, x0))[0]

            x0 = jnp.asarray(np.random.default_rng(0).integers(
                0, n_sa, L).astype(np.int32))
            jax.block_until_ready(chain(src, x0))
            t0 = time.perf_counter()
            for _ in range(3):
                r = chain(src, x0)
            jax.block_until_ready(r)
            res[f"lanes{L}_us_per_round"] = round(
                (time.perf_counter() - t0) / 3 / 64 * 1e6, 2)
        out["width"] = res
    elif mode == "fetch-async":
        # candidate mitigation: start the d2h copy asynchronously and
        # consume it later — does the async path leave dispatch healthy?
        packed = jax.block_until_ready(eng._pack([d1, d2, d3], cap))
        buf = packed[0] if isinstance(packed, tuple) else packed
        t0 = time.time()
        buf.copy_to_host_async()
        out["start_ms"] = round((time.time() - t0) * 1e3, 1)
        out["after_start_us"] = gather_health(eng.di)
        t0 = time.time()
        np.asarray(buf)
        out["consume_ms"] = round((time.time() - t0) * 1e3, 1)
        out["after_consume_us"] = gather_health(eng.di)
    elif mode == "fetch-thread":
        # candidate mitigation: fetch from a worker thread
        import threading

        packed = jax.block_until_ready(eng._pack([d1, d2, d3], cap))
        buf = packed[0] if isinstance(packed, tuple) else packed
        res = {}
        th = threading.Thread(
            target=lambda: res.update(v=np.asarray(buf)))
        t0 = time.time()
        th.start()
        th.join()
        out["fetch_ms"] = round((time.time() - t0) * 1e3, 1)
        out["after_fetch_us"] = gather_health(eng.di)
    elif mode == "fetch-recover":
        # after the triggering fetch: does the state decay with time /
        # repeated measurement, or reset after candidate actions?
        packed = jax.block_until_ready(eng._pack([d1, d2, d3], cap))
        np.asarray(packed[0] if isinstance(packed, tuple) else packed)
        seq = [("t0", None)]
        seq += [(f"repeat{i}", None) for i in range(3)]
        seq += [("after_sleep5", lambda: time.sleep(5)),
                ("after_h2d_1mb", lambda: jax.block_until_ready(
                    jnp.asarray(np.zeros(1 << 18, np.int32)))),
                ("after_step1_rerun", lambda: jax.block_until_ready(
                    eng._fused_step1(eng.di, qbuf, nf, nr, nvf, lens,
                                     jnp.int32(opt.min_seed_len), M=M))),
                ("after_sleep30", lambda: time.sleep(30))]
        rec = {}
        for name, act in seq:
            if act is not None:
                act()
            rec[name] = gather_health(eng.di)
        out["recovery_us"] = rec
    elif mode == "fetch-other":
        n = cap * 3 + lanes
        twin = jax.block_until_ready(
            jax.jit(lambda: jnp.arange(n, dtype=jnp.int32) * 7)())
        t0 = time.time()
        np.asarray(twin)
        out["fetch_ms"] = round((time.time() - t0) * 1e3, 1)
        out["after_fetch_us"] = gather_health(eng.di)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
