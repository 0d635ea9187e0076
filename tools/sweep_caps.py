"""Sweep the straggler-compaction caps of the fused seeding machines on the
real chip: per-op dispatch cost is nearly width-independent below ~4096
lanes (the op floor), so the compacted tails may not be paying for
themselves. Prints steady-state reads/s per (step1_cap1, step2_cap1).

Usage: python tools/sweep_caps.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "jax_cache"))

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import bench
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)[:batch]

    eng = DeviceSeedingEngine(idx, opt, lanes=batch)
    base = None
    for c1, c2 in [(30, 16), (16, 8), (48, 24), (1 << 20, 1 << 20)]:
        eng.step1_cap1 = c1
        eng.step2_cap1 = c2
        t0 = time.time()
        eng.sorted_smems_batch_flat(reads)  # compile at these caps
        warm = time.time() - t0
        t0 = time.time()
        n = 3
        for _ in range(n):
            r = eng.sorted_smems_batch_flat(reads)
        dt = (time.time() - t0) / n
        rps = batch / dt
        if base is None:
            base = rps
        print(f"cap1={c1:>8} cap2={c2:>8}: {rps:8.0f} reads/s "
              f"({rps / base:0.2f}x, warm {warm:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
