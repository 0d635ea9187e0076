"""Microbenchmark: Pallas per-lane DMA gathers vs XLA's native gather.

Decides the round-5 seeding-kernel design (VERDICT r4 item 1). The wall in
device seeding is per-while-iteration XLA machinery (~0.1 ms per fused op
at 4096 lanes) around gathers that are themselves cheap (~1.3 us/round).
A Pallas kernel containing the whole probe loop would collapse the
machinery to ONE op — but Pallas TPU has no vectorized HBM gather, so
every lane's row fetch becomes an async DMA issued by the scalar core.
This tool measures, on the real chip:

  xla_chain      K dependent 4096-lane row gathers under jit (baseline)
  xla_while      the same chain as a lax.while_loop body (the machinery
                 cost the current engine pays)
  dma_flat       one Pallas kernel issuing L independent 512 B row DMAs
                 (all starts, then all waits) -> ns per DMA issue.
                 NOTE: Mosaic on this toolchain compiles DMA row slices
                 only when the trailing dim is 128 lanes (a (1, 4) slice
                 crashes the remote compiler), so rows are 128 x uint32
  dma_window     one Pallas kernel fetching a W-row window per lane
                 (the P-RMI error window as 128-word rows)
  dma_chain      K dependent rounds INSIDE one Pallas kernel (random walk:
                 fetched row -> next index via VMEM->SMEM round trip)

If dma_chain's per-round cost lands well under the measured ~1 ms/round
XLA while-body cost, the fused Pallas seeding kernel wins; the numbers
get committed either way (tools/baselines/pallas_gather.json).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("MB_N", 1 << 21))       # 2M rows x 512 B = 1 GB
L = int(os.environ.get("MB_L", 4096))          # lanes
K = int(os.environ.get("MB_K", 16))            # dependent rounds
W = int(os.environ.get("MB_W", 16))            # window rows per lane


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


# ---------------------------------------------------------------- XLA
@jax.jit
def xla_chain(src, idx):
    def rnd(x, _):
        rows = jnp.take(src, x, axis=0, mode="clip")   # (L, 4)
        x = (rows[:, 0].astype(jnp.int32) ^ (x << 1)) % N
        return x, None
    x, _ = jax.lax.scan(rnd, idx, None, length=K)
    return x


@jax.jit
def xla_while(src, idx):
    def cond(st):
        return st[0] < K

    def body(st):
        k, x = st
        rows = jnp.take(src, x, axis=0, mode="clip")
        x = (rows[:, 0].astype(jnp.int32) ^ (x << 1)) % N
        return k + 1, x

    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), idx))
    return x


# ---------------------------------------------------------------- Pallas
def _dma_flat_kernel(idx_ref, src_ref, out_ref, sem):
    def mk(i):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(idx_ref[i], 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sem)

    def start(i, _):
        mk(i).start()
        return 0

    jax.lax.fori_loop(0, L, start, 0)

    def wait(i, _):
        mk(i).wait()
        return 0

    jax.lax.fori_loop(0, L, wait, 0)


@jax.jit
def dma_flat(src, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _dma_flat_kernel,
        out_shape=jax.ShapeDtypeStruct((L, 128), jnp.uint32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src)


def _dma_window_kernel(idx_ref, src_ref, out_ref, sem):
    def mk(i):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(idx_ref[i], W), :],
            out_ref.at[i],
            sem)

    def start(i, _):
        mk(i).start()
        return 0

    jax.lax.fori_loop(0, L, start, 0)

    def wait(i, _):
        mk(i).wait()
        return 0

    jax.lax.fori_loop(0, L, wait, 0)


@jax.jit
def dma_window(src, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _dma_window_kernel,
        out_shape=jax.ShapeDtypeStruct((L, W, 128), jnp.uint32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src)


def _dma_chain_kernel(idx_ref, src_ref, out_ref, buf, vidx, sidx, sem, csem):
    # round 0 indices come from the prefetched scalars; subsequent rounds
    # derive indices from the fetched rows (VPU in VMEM) and round-trip
    # them to SMEM so the scalar core can use them as DMA addresses — the
    # pattern the fused seeding kernel would repeat per probe round
    def fetch(get_idx):
        def start(i, _):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(get_idx(i), 1), :],
                buf.at[pl.ds(i, 1), :], sem).start()
            return 0

        jax.lax.fori_loop(0, L, start, 0)

        def wait(i, _):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(get_idx(i), 1), :],
                buf.at[pl.ds(i, 1), :], sem).wait()
            return 0

        jax.lax.fori_loop(0, L, wait, 0)

    fetch(lambda i: idx_ref[i])
    x0 = vidx[:]  # warm read; real x carried in VMEM scratch vidx

    def rnd(_k, carry):
        rows = buf[:, 0:1].astype(jnp.int32)               # (L, 1)
        x = jax.lax.rem(rows ^ (carry << 1), jnp.int32(N))
        x = jnp.where(x < 0, x + N, x)
        vidx[:] = x
        cp = pltpu.make_async_copy(vidx, sidx, csem)
        cp.start()
        cp.wait()
        fetch(lambda i: sidx[i, 0])
        return x

    x = jax.lax.fori_loop(
        0, K - 1, rnd, idx_ref[...].astype(jnp.int32).reshape(L, 1))
    del x0
    out_ref[:] = x


@jax.jit
def dma_chain(src, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, 128), jnp.uint32),  # fetched rows
            pltpu.VMEM((L, 1), jnp.int32),    # next indices (vector land)
            pltpu.SMEM((L, 1), jnp.int32),    # next indices (scalar land)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _dma_chain_kernel,
        out_shape=jax.ShapeDtypeStruct((L, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 1 << 30, (N, 128), dtype=np.int64)
                      .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, N, L).astype(np.int32))
    out = {"N": N, "L": L, "K": K, "W": W,
           "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"}

    t, _ = timeit(xla_chain, src, idx)
    out["xla_chain_us_per_round"] = round(t / K * 1e6, 2)
    print(f"xla_chain: {t*1e3:.3f} ms total, {t/K*1e6:.2f} us/round",
          file=sys.stderr)

    t, _ = timeit(xla_while, src, idx)
    out["xla_while_us_per_round"] = round(t / K * 1e6, 2)
    print(f"xla_while: {t*1e3:.3f} ms total, {t/K*1e6:.2f} us/round",
          file=sys.stderr)

    try:
        t, r = timeit(dma_flat, src, idx)
        ref = np.asarray(src)[np.asarray(idx)]
        ok = bool((np.asarray(r) == ref).all())
        out["dma_flat_ns_per_dma"] = round(t / L * 1e9, 1)
        out["dma_flat_ok"] = ok
        print(f"dma_flat: {t*1e3:.3f} ms total, {t/L*1e9:.0f} ns/DMA, "
              f"correct={ok}", file=sys.stderr)
    except Exception as e:
        out["dma_flat_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"dma_flat FAILED: {out['dma_flat_error']}", file=sys.stderr)

    try:
        idxw = jnp.minimum(idx, N - W)
        t, r = timeit(dma_window, src, idxw)
        ref = np.stack([np.asarray(src)[i: i + W]
                        for i in np.asarray(idxw)])
        ok = bool((np.asarray(r) == ref).all())
        out["dma_window_ns_per_dma"] = round(t / L * 1e9, 1)
        out["dma_window_ok"] = ok
        print(f"dma_window({W}): {t*1e3:.3f} ms total, {t/L*1e9:.0f} ns/DMA,"
              f" correct={ok}", file=sys.stderr)
    except Exception as e:
        out["dma_window_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"dma_window FAILED: {out['dma_window_error']}",
              file=sys.stderr)

    try:
        t, r = timeit(dma_chain, src, idx)
        # numpy emulation of the same K-round random walk (int32 wrap)
        s0 = np.asarray(src)[:, 0].astype(np.int32)
        x = np.asarray(idx).astype(np.int32)
        with np.errstate(over="ignore"):
            for _ in range(K - 1):
                rows = s0[x]
                x = ((rows ^ (x << np.int32(1))) % np.int32(N)).astype(
                    np.int32)
                x = np.where(x < 0, x + N, x)
        ok = bool((np.asarray(r)[:, 0] == x).all())
        out["dma_chain_us_per_round"] = round(t / K * 1e6, 2)
        out["dma_chain_ok"] = ok
        print(f"dma_chain: {t*1e3:.3f} ms total, {t/K*1e6:.2f} us/round, "
              f"correct={ok}", file=sys.stderr)
    except Exception as e:
        out["dma_chain_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"dma_chain FAILED: {out['dma_chain_error']}", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baselines", "pallas_gather.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
