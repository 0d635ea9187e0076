"""Measure the REFERENCE BINARY's throughput on the bench workload.

Produces .bench_cache/ref_baseline_{N}mbp.json with the reference
bwa-meme's seeding and end-to-end reads/s on THIS host's CPU, over the
exact same synthetic contig and read set bench.py uses. bench.py reports
`vs_baseline` against these numbers (TPU-chip vs host-CPU), replacing the
round-1 strawman (our own Python oracle).

The reference runs its FM-index path (`index -a mem2`, default `mem`) —
the BWA-MEM2-equivalent backend that BWA-MEME's own 3.32x seeding claim
is measured against (reference: README.md:8). Its learned path needs the
Rust P-RMI trainer, which this image lacks.

Seeding time is parsed from the binary's display_stats breakdown
(reference: src/profiling.cpp:54-160): seeding == SMEM compute + SAL
compute (SA lookup); end-to-end == PROCESS() wall.

Usage: python tools/bench_reference.py  (env: BWAMEME_BENCH_MBP,
BWAMEME_BENCH_READS, BWAMEME_REF_BIN, BWAMEME_BENCH_THREADS)
"""

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_ref_bin() -> str:
    ref = os.environ.get("BWAMEME_REF_BIN", "/tmp/refbuild/bwa-meme")
    if not os.path.exists(ref):
        here = os.path.dirname(os.path.abspath(__file__))
        out = subprocess.run(["sh", os.path.join(here, "build_reference.sh"),
                              os.path.dirname(ref)],
                             capture_output=True, text=True)
        if out.returncode != 0:
            raise RuntimeError(f"reference build failed: {out.stderr[-500:]}")
    return ref


def write_workload(cache: str, mbp: int):
    """FASTA + FASTQ of bench.py's exact contig and reads (same RNG)."""
    fa = os.path.join(cache, f"bench_{mbp}mbp.fa")
    fq = os.path.join(cache, f"bench_reads_{mbp}mbp.fq")
    if os.path.exists(fa) and os.path.exists(fq):
        n_reads = sum(1 for line in open(fq) if line.startswith("@"))
        return fa, fq, n_reads
    import bench

    idx = bench.get_index()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)
    fa = os.path.join(cache, f"bench_{mbp}mbp.fa")
    fq = os.path.join(cache, f"bench_reads_{mbp}mbp.fq")
    chars = np.frombuffer(b"ACGT", np.uint8)
    if not os.path.exists(fa):
        s = chars[idx.bns.code].tobytes().decode()
        with open(fa, "w") as f:
            f.write(">chrB bench contig\n")
            for i in range(0, len(s), 80):
                f.write(s[i: i + 80] + "\n")
    if not os.path.exists(fq):
        with open(fq, "w") as f:
            for i, c in enumerate(reads):
                s = chars[c].tobytes().decode()
                f.write(f"@b{i}\n{s}\n+\n{'I' * len(s)}\n")
    return fa, fq, len(reads)


def parse_stats(stderr: str) -> dict:
    out = {}
    pats = {
        "smem": r"SMEM compute avg:\s*([0-9.]+)",
        "sal": r"SAL compute avg:\s*([0-9.]+)",
        "bsw": r"BSW time, avg:\s*([0-9.]+)",
        "kernel": r"Total kernel \(smem\+sal\+bsw\) time avg:\s*([0-9.]+)",
        "process": r"PROCESS\(\).*?:\s*([0-9.]+)",
        "mem_process_seq": r"MEM_PROCESS_SEQ\(\).*?avg:\s*([0-9.]+)",
    }
    for k, p in pats.items():
        m = re.search(p, stderr)
        if m:
            out[k] = float(m.group(1))
    return out


def main():
    # default must track bench.py's REF_MBP (bench.py passes the env
    # explicitly; this default covers standalone runs)
    mbp = int(float(os.environ.get("BWAMEME_BENCH_MBP", "100")))
    nthreads = int(os.environ.get("BWAMEME_BENCH_THREADS",
                                  str(os.cpu_count() or 1)))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    os.makedirs(cache, exist_ok=True)

    ref = ensure_ref_bin()
    fa, fq, n_reads = write_workload(cache, mbp)

    if not os.path.exists(fa + ".bwt.2bit.64"):
        print(f"# building reference FM index over {fa}", file=sys.stderr)
        t0 = time.time()
        subprocess.run([ref, "index", "-a", "mem2", fa], check=True,
                       capture_output=True)
        print(f"# reference index: {time.time()-t0:.1f}s", file=sys.stderr)

    print(f"# reference mem -t {nthreads} over {n_reads} reads",
          file=sys.stderr)
    t0 = time.time()
    out = subprocess.run(
        [ref, "mem", "-t", str(nthreads), "-K", "100000000", fa, fq],
        check=True, capture_output=True, text=True)
    wall = time.time() - t0
    st = parse_stats(out.stderr)
    seed_t = st.get("smem", 0.0) + st.get("sal", 0.0)
    e2e_t = st.get("process", wall)
    result = {
        "mbp": mbp,
        "n_reads": n_reads,
        "nthreads": nthreads,
        "host_cpus": os.cpu_count(),
        "wall_s": round(wall, 3),
        "stages": st,
        "seeding_rps": round(n_reads / seed_t, 1) if seed_t > 0 else None,
        "e2e_rps": round(n_reads / e2e_t, 1) if e2e_t > 0 else None,
        "note": "reference bwa-meme (FM-index backend = BWA-MEM2 "
                "equivalent) on this host's CPU; seeding = SMEM+SAL "
                "from display_stats",
    }
    path = os.path.join(cache, f"ref_baseline_{mbp}mbp.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
