"""Quick chip measurement: seeding + e2e SE + e2e PE at a given index size,
WITHOUT touching the reference baseline (bench.py's measurement core only).

Usage: python tools/chip_e2e.py [mbp] [n_reads] [--mode N] [--root prmi|kmer|fmi]
Writes one JSON line to stdout; progress to stderr.
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
os.environ.setdefault("BWAMEME_STRICT", "1")

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(a.split("=", 1) if "=" in a else (a, "1")
              for a in sys.argv[1:] if a.startswith("--"))
    mbp = float(args[0]) if args else 100
    n_reads = int(args[1]) if len(args) > 1 else 8192
    os.environ["BWAMEME_BENCH_MBP"] = str(mbp)
    os.environ["BWAMEME_BENCH_READS"] = str(n_reads)
    if "--root" in kv:
        os.environ["BWAMEME_BENCH_ROOT"] = kv["--root"]
    if "--mode" in kv:
        os.environ["BWAMEME_BENCH_MODE"] = kv["--mode"]
    if "--wide" in kv:
        os.environ["JAX_ENABLE_X64"] = "1"
    import bench
    import jax

    from bwameme_tpu.io.fastq import Read
    from bwameme_tpu.pipeline import Aligner
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils import fallbacks
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)
    BATCH = bench.BATCH
    root = os.environ.get("BWAMEME_BENCH_ROOT", "prmi")
    mode = kv.get("--mode")
    t0 = time.time()
    if root == "fmi":
        from bwameme_tpu.index.fmindex import (build_fm_index, load_fm_index,
                                               save_fm_index)
        from bwameme_tpu.seeding.fmi_engine import FmiDeviceEngine

        prefix = os.path.join(bench.CACHE, f"bench_{int(mbp)}mbp")
        try:
            fm = load_fm_index(prefix)
        except (OSError, KeyError):
            fm = build_fm_index(idx.bns.code)
            save_fm_index(prefix, fm)
        eng = FmiDeviceEngine(idx, opt, fm=fm, lanes=BATCH)
    else:
        eng = DeviceSeedingEngine(
            idx, opt, lanes=BATCH, mode=(int(mode) if mode else None),
            wide=(True if "--wide" in kv else None),
            **({"root": "kmer", "ert_bits": 0} if root == "kmer" else {}))
    print(f"# engine up: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    def seed_batch(batch):
        if hasattr(eng, "sorted_smems_batch_flat"):
            f = eng.sorted_smems_batch_flat(batch)
            return None if f is None else len(f.start)
        return sum(len(s) for s in eng.sorted_smems_batch(batch))

    t0 = time.time()
    seed_batch(reads[:BATCH])
    print(f"# seed warmup+compile: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.time()
    n_smems = 0
    for i in range(0, len(reads), BATCH):
        n_smems += seed_batch(reads[i: i + BATCH])
    dt = time.time() - t0
    seed_rps = len(reads) / dt
    print(f"# seeding: {seed_rps:.0f} reads/s ({n_smems} smems)",
          file=sys.stderr, flush=True)

    chars = np.frombuffer(b"ACGT", np.uint8)

    def to_read(tag, i, c):
        return Read(name=f"{tag}{i}", seq=chars[c].tobytes().decode(),
                    qual="I" * len(c), comment=None)

    read_objs = [to_read("b", i, c) for i, c in enumerate(reads)]
    al = Aligner(idx, opt, seeding_engine=eng)
    batches = [read_objs[i: i + BATCH]
               for i in range(0, len(read_objs), BATCH)]
    t0 = time.time()
    sum(len(s) for s in al.align_stream(iter(batches[:1])))
    print(f"# e2e warmup+compile: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    from bwameme_tpu.utils.timer import TPROF

    TPROF.totals.clear()
    TPROF.counts.clear()
    t0 = time.time()
    n_rec = sum(len(s) for s in al.align_stream(iter(batches)))
    wall_se = time.time() - t0
    e2e_se_rps = len(read_objs) / wall_se
    print(f"# e2e SE: {e2e_se_rps:.0f} reads/s ({n_rec} records)",
          file=sys.stderr, flush=True)
    try:
        TPROF.report(sys.stderr, total=wall_se)
    except Exception:
        pass

    pair_objs = [to_read("p", i >> 1, c)
                 for i, c in enumerate(
                     bench.make_pairs(idx, np.random.default_rng(13)))]
    t0 = time.time()
    al.align_pairs(pair_objs)
    print(f"# PE warmup+compile: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    TPROF.totals.clear()
    TPROF.counts.clear()
    t0 = time.time()
    sam_pe = al.align_pairs(pair_objs)
    wall_pe = time.time() - t0
    e2e_pe_rps = len(pair_objs) / wall_pe
    print(f"# e2e PE: {e2e_pe_rps:.0f} reads/s", file=sys.stderr, flush=True)
    try:
        TPROF.report(sys.stderr, total=wall_pe, label="PE stage breakdown")
    except Exception:
        pass
    if fallbacks.total():
        print(f"# FALLBACKS: {fallbacks.summary()}", file=sys.stderr)
    print(json.dumps({"mbp": mbp, "root": root, "mode": mode,
                      "seeding_rps": round(seed_rps, 1),
                      "e2e_se_rps": round(e2e_se_rps, 1),
                      "e2e_pe_rps": round(e2e_pe_rps, 1)}))


if __name__ == "__main__":
    main()
