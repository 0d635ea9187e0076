"""A/B the banded-SW extension backend (XLA while-loop kernel vs the Pallas
Mosaic kernel, ops/banded_sw_pallas.py) on the real chip.

Runs the PRODUCTION path: full Aligner.align_stream over the bench index
with mutated reads, once per backend (subprocess per backend — the knob is
read at import). Reports e2e reads/s and the extension-stage seconds from
the StageTimer, plus a direct result cross-check between backends.

Usage:  python tools/ab_extend.py [n_reads]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(pallas: bool, n_reads: int) -> dict:
    env = dict(
        os.environ,
        BWAMEME_PALLAS="1" if pallas else "0",
        BWAMEME_AB_READS=str(n_reads),
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".bench_cache",
                                               "jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env, capture_output=True, text=True, timeout=3600)
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        raise RuntimeError(f"child failed rc={out.returncode}")
    return json.loads(out.stdout.splitlines()[-1])


def child() -> None:
    import time

    import numpy as np

    sys.path.insert(0, REPO)
    from bwameme_tpu.io.fastq import Read
    from bwameme_tpu.pipeline import Aligner
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions
    from bwameme_tpu.utils import timer as timer_mod

    sys.path.insert(0, os.path.join(REPO))
    import importlib

    bench = importlib.import_module("bench")
    idx = bench.get_index()
    n_reads = int(os.environ.get("BWAMEME_AB_READS", "4096"))
    rng = np.random.default_rng(11)
    chars = "ACGT"
    reads = []
    for i, c in enumerate(bench.make_reads(idx, rng)[:n_reads]):
        reads.append(Read(name=f"r{i}", seq="".join(chars[x] for x in c),
                          qual="I" * len(c), comment=None))
    opt = MemOptions()
    lanes = int(os.environ.get("BWAMEME_AB_LANES", "2048"))
    eng = DeviceSeedingEngine(idx, opt, lanes=lanes)
    al = Aligner(idx, opt, seeding_engine=eng)
    batches = [reads[i: i + lanes] for i in range(0, len(reads), lanes)]
    # warmup: one full batch (compiles every kernel at production shape)
    t0 = time.time()
    sum(1 for _ in al.align_stream(iter(batches[:1])))
    warm = time.time() - t0
    timer_mod.TPROF.totals.clear()
    timer_mod.TPROF.counts.clear()
    import hashlib

    t0 = time.time()
    h = hashlib.sha256()
    n_rec = 0
    for sam in al.align_stream(iter(batches)):
        n_rec += len(sam)
        for s in sam:
            h.update(s.encode())
    dt = time.time() - t0
    timer_mod.TPROF.report(total=dt, label="A/B stage breakdown")
    ext = sum(v for k, v in timer_mod.TPROF.totals.items()
              if k.startswith("extend."))
    print(json.dumps({
        "pallas": os.environ.get("BWAMEME_PALLAS") == "1",
        "e2e_rps": round(len(reads) / dt, 1),
        "extend_s": round(ext, 2),
        "warmup_s": round(warm, 1),
        "records": n_rec,
        "sam_sha": h.hexdigest()[:16],
    }))


def main() -> None:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 4096
    a = run_one(False, n_reads)
    b = run_one(True, n_reads)
    print(json.dumps({"xla": a, "pallas": b,
                      "speedup": round(b["e2e_rps"] / a["e2e_rps"], 3)}))
    if a["sam_sha"] != b["sam_sha"]:
        print("WARNING: SAM output differs between backends!",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
