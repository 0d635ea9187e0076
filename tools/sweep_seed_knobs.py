"""On-chip sweep of seeding-engine knobs (one subprocess per config —
the TPU tunnel is single-tenant and the knobs are engine-build-time).

Sweeps BWAMEME_STEP1_CAP1 (full-width iterations before straggler
compaction), BWAMEME_EAGER_DEEP (deep compare segments run without the
per-round any() reduction), lanes. Each config reports warm steady-state
reads/s over the bench workload; results append to /tmp/seed_knobs.jsonl.

Usage: python tools/sweep_seed_knobs.py [mbp]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os, time, json
sys.path.insert(0, %(repo)r)
os.environ['BWAMEME_BENCH_MBP'] = %(mbp)r
from bwameme_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache(%(repo)r + '/.bench_cache/jax_cache')
import bench
from bwameme_tpu.seeding.engine import DeviceSeedingEngine
from bwameme_tpu.utils.config import MemOptions
import numpy as np
idx = bench.get_index()
opt = MemOptions()
reads = bench.make_reads(idx, np.random.default_rng(7))
lanes = int(os.environ.get('BWAMEME_SWEEP_LANES', '4096'))
t0 = time.time()
eng = DeviceSeedingEngine(idx, opt, lanes=lanes)
init_s = time.time() - t0
t0 = time.time()
eng.sorted_smems_batch_flat(reads[:lanes])
warm_s = time.time() - t0
reps = max(2, 8192 // lanes)
batches = [reads[(i * lanes) %% len(reads):][:lanes] for i in range(reps)]
batches = [b if len(b) == lanes else (b + reads[:lanes - len(b)]) for b in batches]
t0 = time.time()
toks = [eng.submit_batch(b) for b in batches]
n = 0
for tk in toks:
    f = eng.finish_batch_flat(tk)
    n += len(f.start) if f is not None else -1
rps = lanes * reps / (time.time() - t0)
print(json.dumps(dict(lanes=lanes, cap1=os.environ.get('BWAMEME_STEP1_CAP1'),
                      eager=os.environ.get('BWAMEME_EAGER_DEEP'),
                      cap2=os.environ.get('BWAMEME_STEP2_CAP1'),
                      init_s=round(init_s, 1), warm_s=round(warm_s, 1),
                      rps=round(rps), n_smems=n)), flush=True)
"""


def run(cfg, mbp):
    env = dict(os.environ, **{k: str(v) for k, v in cfg.items()})
    t0 = time.time()
    out = subprocess.run([sys.executable, "-c",
                          CHILD % dict(repo=REPO, mbp=mbp)],
                         capture_output=True, text=True, timeout=1800,
                         env=env, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    rec = json.loads(line[-1]) if line else {"error": out.stderr[-400:]}
    rec["wall"] = round(time.time() - t0, 1)
    rec["cfg"] = cfg
    print(json.dumps(rec), flush=True)
    with open("/tmp/seed_knobs.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    mbp = sys.argv[1] if len(sys.argv) > 1 else "100"
    import json as _json
    configs = (
        [_json.loads(a) for a in sys.argv[2:]]
        if len(sys.argv) > 2 else [
            {},
            {"BWAMEME_STEP2_CAP1": 32},
        ])
    for cfg in configs:
        try:
            run(cfg, mbp)
        except Exception as e:
            print(json.dumps({"cfg": cfg, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
