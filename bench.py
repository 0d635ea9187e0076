"""Benchmark: learned-index seeding throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline BWA-MEME metric is seeding throughput (reference README.md:8:
up to 3.32x BWA-MEM2 per CPU socket). Absolute reference numbers are not
published machine-readably (BASELINE.md), so `vs_baseline` here reports the
speedup of the batched TPU engine over this repo's own scalar host oracle
(HostSeedingEngine) run on this machine's CPU — a conservative stand-in
measured fresh each run.
"""

import json
import os
import sys
import time

# persistent compilation cache: TPU (remote) compiles of the search kernels
# are expensive; cache them across bench runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
                 "jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

REF_MBP = float(os.environ.get("BWAMEME_BENCH_MBP", "8"))
N_READS = int(os.environ.get("BWAMEME_BENCH_READS", "4096"))
READ_LEN = 151
BATCH = int(os.environ.get("BWAMEME_BENCH_BATCH", "2048"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def get_index():
    from bwameme_tpu.index import bntseq
    from bwameme_tpu.index.build import build_index, load_index, save_index

    prefix = os.path.join(CACHE, f"bench_{int(REF_MBP)}mbp")
    if os.path.exists(prefix + ".meme.npz"):
        return load_index(prefix)
    os.makedirs(CACHE, exist_ok=True)
    rng = np.random.default_rng(2024)
    n = int(REF_MBP * 1e6)
    code = rng.integers(0, 4, n).astype(np.uint8)
    # sprinkle realistic repeats
    for _ in range(200):
        src = int(rng.integers(0, n - 5000))
        dst = int(rng.integers(0, n - 5000))
        ln = int(rng.integers(300, 3000))
        code[dst: dst + ln] = code[src: src + ln]
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("chrB", "", 0, n, 0)], ambs=[],
        code=code,
    )
    t0 = time.time()
    idx = build_index(bns)
    print(f"# index build: {time.time()-t0:.1f}s "
          f"(n_sa={idx.n_sa}, rmi_bits={idx.rmi_bits}, max_err={idx.max_err})",
          file=sys.stderr)
    save_index(idx, prefix)
    return idx


def make_reads(idx, rng):
    reads = []
    for i in range(N_READS):
        st = int(rng.integers(0, idx.l_pac - READ_LEN - 1))
        c = idx.text[st: st + READ_LEN].copy()
        nmut = rng.poisson(1.0)
        for _ in range(nmut):
            p = int(rng.integers(0, READ_LEN))
            c[p] = (c[p] + rng.integers(1, 4)) % 4
        if i % 2:
            c = (3 - c[::-1]).astype(np.uint8)
        reads.append(c)
    return reads


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from bwameme_tpu.utils.compile_cache import enable_persistent_cache

    cache = enable_persistent_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])
    _log(f"compile cache: {cache}")

    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.seeding.host_engine import HostSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    _log("loading index")
    idx = get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = make_reads(idx, rng)

    _log("building device engine (index upload)")
    eng = DeviceSeedingEngine(idx, opt, lanes=BATCH)
    _log("engine ready; warmup")
    # warmup/compile: run the first full-size batch once (same shapes as
    # production so nothing recompiles during the timed run)
    import time as _t
    _t0 = _t.time()
    if eng.sorted_smems_batch_flat(reads[:BATCH]) is None:
        eng.collect_smems_batch(reads[:BATCH])
    print(f"# warmup+compile: {_t.time()-_t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    n_smems = 0
    for i in range(0, len(reads), BATCH):
        flat = eng.sorted_smems_batch_flat(reads[i: i + BATCH])
        if flat is not None:  # the production path: packed device compaction
            n_smems += len(flat.start)
        else:
            out = eng.collect_smems_batch(reads[i: i + BATCH])
            n_smems += sum(len(s) for s in out)
    dt = time.time() - t0
    device_rps = len(reads) / dt
    print(f"# device seeding: {len(reads)} reads in {dt:.2f}s "
          f"({device_rps:.0f} reads/s), {n_smems} smems", file=sys.stderr)

    # host scalar oracle baseline on a subsample
    host = HostSeedingEngine(idx, opt)
    sub = reads[:: max(1, len(reads) // 128)][:128]
    t0 = time.time()
    for c in sub:
        host.collect_smems(c)
    host_rps = len(sub) / (time.time() - t0)
    print(f"# host oracle: {host_rps:.0f} reads/s", file=sys.stderr)

    print(json.dumps({
        "metric": "seeding_throughput",
        "value": round(device_rps, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(device_rps / max(host_rps, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
