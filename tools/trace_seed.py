"""Capture a jax.profiler trace of the fused seeding dispatches on the real
chip (the -p flag analog for perf work; SURVEY §5 observability).

Writes a TensorBoard-format trace to /tmp/seedtrace (or $1) and prints the
top self-time ops parsed from the trace's *.xplane.pb when the profiler
plugin is importable; otherwise just leaves the trace for offline analysis.

Usage: python tools/trace_seed.py [outdir] [batch]
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
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/seedtrace"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    import jax

    import bench
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)[:batch]
    eng = DeviceSeedingEngine(idx, opt, lanes=batch)
    # warmup = compile
    t0 = time.time()
    eng.sorted_smems_batch_flat(reads)
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            eng.sorted_smems_batch_flat(reads)
    print(f"# trace written to {outdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
