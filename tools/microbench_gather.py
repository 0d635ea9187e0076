"""Microbenchmark: HBM gather economics on the TPU for seeding design.

Answers, on the real chip:
 1. latency of a chain of K *dependent* gathers (varying lanes);
 2. marginal cost of *independent* gathers issued in one step;
 3. cost of one sa_query_min1-shaped round at production shapes.

Run from /root/repo:  python tools/microbench_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench_cache/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

N = 32 * 1024 * 1024  # 32M-entry uint32 table = 128 MB (sa-plane scale)


def timeit(f, *a, reps=5):
    f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else f(*a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    (r[0] if isinstance(r, tuple) else r).block_until_ready()
    return (time.perf_counter() - t0) / reps


@partial(jax.jit, static_argnames=("k",))
def chain(table, x, k):
    def body(i, x):
        return jnp.take(table, x, mode="clip") ^ jnp.uint32(i)
    return jax.lax.fori_loop(0, k, body, x) & jnp.uint32(N - 1)


@partial(jax.jit, static_argnames=("g", "k"))
def indep(table, x, g, k):
    """k sequential rounds, each issuing g independent gathers."""
    def body(i, x):
        acc = jnp.uint32(0)
        for j in range(g):
            acc = acc ^ jnp.take(table, (x + jnp.uint32(j * 977)) & jnp.uint32(N - 1),
                                 mode="clip")
        return (x ^ acc ^ jnp.uint32(i)) & jnp.uint32(N - 1)
    return jax.lax.fori_loop(0, k, body, x)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, N, N).astype(np.uint32))
    table.block_until_ready()
    print("table resident (128 MB)", flush=True)

    K = 64
    print("\n== dependent-gather chain: per-step latency (K=64 steps) ==")
    for lanes in (2048, 8192, 65536):
        x = jnp.asarray(rng.integers(0, N, lanes).astype(np.uint32))
        dt = timeit(chain, table, x, K)
        print(f" lanes={lanes:6d}: {dt*1e3:7.2f} ms total, "
              f"{dt/K*1e6:8.1f} us/step, {dt/K/lanes*1e9:7.2f} ns/lane",
              flush=True)

    print("\n== independent gathers per round (lanes=2048, K=32 rounds) ==")
    lanes = 2048
    x = jnp.asarray(rng.integers(0, N, lanes).astype(np.uint32))
    base = None
    for g in (1, 4, 12):
        dt = timeit(indep, table, x, g, 32)
        per_round = dt / 32
        if base is None:
            base = per_round
        print(f" g={g:2d}: {per_round*1e6:8.1f} us/round "
              f"(+{(per_round-base)*1e6:7.1f} us vs g=1)", flush=True)

    print("\n== independent gathers per round (lanes=8192) ==")
    lanes = 8192
    x = jnp.asarray(rng.integers(0, N, lanes).astype(np.uint32))
    base = None
    for g in (1, 4):
        dt = timeit(indep, table, x, g, 32)
        per_round = dt / 32
        if base is None:
            base = per_round
        print(f" g={g:2d}: {per_round*1e6:8.1f} us/round "
              f"(+{(per_round-base)*1e6:7.1f} us vs g=1)", flush=True)

    # small-table control: is latency table-size dependent (cache effects)?
    print("\n== small table (1M entries = 4 MB) dependent chain ==")
    Ns = 1024 * 1024
    ts = jnp.asarray(rng.integers(0, Ns, Ns).astype(np.uint32))

    @partial(jax.jit, static_argnames=("k",))
    def chain_s(table, x, k):
        def body(i, x):
            return jnp.take(table, x, mode="clip") & jnp.uint32(Ns - 1)
        return jax.lax.fori_loop(0, k, body, x)

    for lanes in (2048, 8192):
        x = jnp.asarray(rng.integers(0, Ns, lanes).astype(np.uint32))
        dt = timeit(chain_s, ts, x, K)
        print(f" lanes={lanes:6d}: {dt/K*1e6:8.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
