"""Measure the REFERENCE BINARY's throughput on the bench workload.

Produces .bench_cache/ref_baseline_{N}mbp.json with the reference
bwa-meme's seeding and end-to-end reads/s on THIS host's CPU, over the
exact same synthetic contig and read set bench.py uses. bench.py reports
`vs_baseline` against these numbers (TPU-chip vs host-CPU), replacing the
round-1 strawman (our own Python oracle).

Two reference backends are timed, each over `trials` repeated runs
(median + min/max spread — a single cached run on a throttled shared vCPU
is not trustworthy, see VERDICT r2 weak #2):

* FM-index path (default `mem`): the BWA-MEM2-equivalent backend that
  BWA-MEME's own 3.32x seeding claim is measured against (reference:
  README.md:8). seeding == SMEM+SAL from display_stats
  (src/profiling.cpp:54-160); e2e == PROCESS().
* Learned path (`mem -7`): the reference's OWN headline engine, running on
  OUR exported index (index/formats.export_reference_formats +
  models/prmi.write_rmi_parameters emit `.pos_packed` and the
  `_L{0,1,2}_PARAMETERS` the Rust trainer would produce — so `-7` runs
  without the Rust toolchain, and the export is byte-validated against the
  real consumer). Its kernel-1 counter LEARNED_SEED_CHAIN includes
  chaining (src/bwamem.cpp:1411), so `learned_seedchain_rps` is seeding +
  chaining — compare against our seed+chain, not seeding alone.

Both backends are also timed over the paired-end workload (R1/R2 fastqs,
same RNG as bench.make_pairs) for the e2e PE baseline.

Usage: python tools/bench_reference.py  (env: BWAMEME_BENCH_MBP,
BWAMEME_BENCH_READS, BWAMEME_REF_BIN, BWAMEME_BENCH_THREADS,
BWAMEME_BASELINE_TRIALS, BWAMEME_SKIP_LEARNED=1)
"""

import json
import os
import re
import statistics
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
    fq1 = os.path.join(cache, f"bench_pairs_{mbp}mbp_1.fq")
    fq2 = os.path.join(cache, f"bench_pairs_{mbp}mbp_2.fq")
    if all(os.path.exists(p) for p in (fa, fq, fq1, fq2)):
        n_reads = sum(1 for line in open(fq) if line.startswith("@"))
        n_pe = sum(1 for line in open(fq1) if line.startswith("@"))
        return fa, fq, n_reads, (fq1, fq2), n_pe
    import bench

    idx = bench.get_index()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)
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
    if not (os.path.exists(fq1) and os.path.exists(fq2)):
        pairs = bench.make_pairs(idx, np.random.default_rng(13))
        with open(fq1, "w") as f1, open(fq2, "w") as f2:
            for i in range(0, len(pairs), 2):
                s1 = chars[pairs[i]].tobytes().decode()
                s2 = chars[pairs[i + 1]].tobytes().decode()
                f1.write(f"@p{i//2}\n{s1}\n+\n{'I' * len(s1)}\n")
                f2.write(f"@p{i//2}\n{s2}\n+\n{'I' * len(s2)}\n")
    n_pe = sum(1 for line in open(fq1) if line.startswith("@"))
    return fa, fq, len(reads), (fq1, fq2), n_pe


def ensure_learned_export(cache: str, mbp: int, fa: str) -> bool:
    """Export `.pos_packed` + `_L{0,1,2}_PARAMETERS` (+ reuse the
    reference-built `.0123`) so `mem -7` runs over our index. Returns
    False when our .meme index is absent (nothing to export from)."""
    need = [fa + ".pos_packed", fa + ".suffixarray_uint64_L2_PARAMETERS",
            fa + ".suffixarray_uint64_L1_PARAMETERS",
            fa + ".suffixarray_uint64_L0_PARAMETERS"]
    if all(os.path.exists(p) for p in need):
        return True
    prefix = os.path.join(cache, f"bench_{mbp}mbp")
    if not (os.path.isdir(prefix + ".meme")
            or os.path.exists(prefix + ".meme.npz")):
        return False
    from bwameme_tpu.index.build import load_index
    from bwameme_tpu.index.formats import write_0123, write_pos_packed
    from bwameme_tpu.models.prmi import write_rmi_parameters

    print(f"# exporting learned-index files for {fa}", file=sys.stderr)
    idx = load_index(prefix)
    if not os.path.exists(fa + ".0123"):
        write_0123(idx, fa)
    if not os.path.exists(fa + ".pos_packed"):
        write_pos_packed(idx, fa)
    write_rmi_parameters(idx, fa)
    return True


def parse_stats(stderr: str) -> dict:
    out = {}
    pats = {
        "smem": r"SMEM compute avg:\s*([0-9.]+)",
        "sal": r"SAL compute avg:\s*([0-9.]+)",
        "bsw": r"BSW time, avg:\s*([0-9.]+)",
        "learned_seed_chain": r"LEARNED_SEED_CHAIN avg:\s*([0-9.]+)",
        "kernel": r"Total kernel \(smem\+sal\+bsw\) time avg:\s*([0-9.]+)",
        "process": r"PROCESS\(\).*?:\s*([0-9.]+)",
        "mem_process_seq": r"MEM_PROCESS_SEQ\(\).*?avg:\s*([0-9.]+)",
    }
    for k, p in pats.items():
        m = re.search(p, stderr)
        if m:
            out[k] = float(m.group(1))
    return out


def run_trials(ref, args, trials):
    """Run the binary `trials` times; per-stage medians + spread."""
    runs = []
    for _ in range(trials):
        t0 = time.time()
        out = subprocess.run(args, check=True, capture_output=True, text=True)
        wall = time.time() - t0
        st = parse_stats(out.stderr)
        st["wall"] = wall
        runs.append(st)
    keys = set().union(*(r.keys() for r in runs))
    med = {k: round(statistics.median([r[k] for r in runs if k in r]), 3)
           for k in keys}
    spread = {k: [round(min(r[k] for r in runs if k in r), 3),
                  round(max(r[k] for r in runs if k in r), 3)]
              for k in keys}
    return med, spread, runs


def main():
    # default must track bench.py's REF_MBP (bench.py passes the env
    # explicitly; this default covers standalone runs)
    mbp = int(float(os.environ.get("BWAMEME_BENCH_MBP", "100")))
    nthreads = int(os.environ.get("BWAMEME_BENCH_THREADS",
                                  str(os.cpu_count() or 1)))
    trials = int(os.environ.get("BWAMEME_BASELINE_TRIALS", "5"))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    os.makedirs(cache, exist_ok=True)

    ref = ensure_ref_bin()
    fa, fq, n_reads, (fq1, fq2), n_pe = write_workload(cache, mbp)

    if not os.path.exists(fa + ".bwt.2bit.64"):
        print(f"# building reference FM index over {fa}", file=sys.stderr)
        t0 = time.time()
        subprocess.run([ref, "index", "-a", "mem2", fa], check=True,
                       capture_output=True)
        print(f"# reference index: {time.time()-t0:.1f}s", file=sys.stderr)

    base = [ref, "mem", "-t", str(nthreads), "-K", "100000000"]
    result = {
        "mbp": mbp,
        "n_reads": n_reads,
        "n_pairs": n_pe,
        "nthreads": nthreads,
        "host_cpus": os.cpu_count(),
        "trials": trials,
        "note": "reference bwa-meme on this host's CPU; fm = FM-index "
                "backend (BWA-MEM2 equivalent), seeding = SMEM+SAL from "
                "display_stats; learned = the -7 P-RMI path on OUR "
                "exported index (seed_chain incl. chaining); all numbers "
                "are medians over `trials` runs, spread = [min, max]",
    }

    print(f"# reference FM mem -t {nthreads}, {trials} trials",
          file=sys.stderr)
    med, spread, _ = run_trials(ref, base + [fa, fq], trials)
    seed_t = med.get("smem", 0.0) + med.get("sal", 0.0)
    e2e_t = med.get("process", med["wall"])
    result["stages"] = med
    result["spread"] = spread
    result["seeding_rps"] = round(n_reads / seed_t, 1) if seed_t else None
    result["e2e_rps"] = round(n_reads / e2e_t, 1) if e2e_t else None

    print(f"# reference FM PE mem -t {nthreads}, {trials} trials",
          file=sys.stderr)
    med_pe, spread_pe, _ = run_trials(ref, base + [fa, fq1, fq2], trials)
    e2e_pe_t = med_pe.get("process", med_pe["wall"])
    result["stages_pe"] = med_pe
    result["spread_pe"] = spread_pe
    result["e2e_pe_rps"] = (round(2 * n_pe / e2e_pe_t, 1)
                            if e2e_pe_t else None)

    if os.environ.get("BWAMEME_SKIP_LEARNED") != "1":
        try:
            have = ensure_learned_export(cache, mbp, fa)
        except Exception as e:
            print(f"# learned export failed: {e}", file=sys.stderr)
            have = False
        if have:
            print(f"# reference LEARNED mem -7, {trials} trials",
                  file=sys.stderr)
            med_l, spread_l, _ = run_trials(ref, base + ["-7", fa, fq],
                                            trials)
            sc_t = med_l.get("learned_seed_chain", 0.0)
            # PROCESS() on -7 includes the runtime key/ISA index rebuild
            # (fastmap.cpp:548-612), so the learned e2e uses
            # MEM_PROCESS_SEQ (compute incl. SAM build, excl. read IO) —
            # slightly flattering to the reference, i.e. conservative
            # for our vs_meme ratios
            e2e_l = med_l.get("mem_process_seq", med_l["wall"])
            result["learned_stages"] = med_l
            result["learned_spread"] = spread_l
            result["learned_seedchain_rps"] = (round(n_reads / sc_t, 1)
                                               if sc_t else None)
            result["learned_e2e_rps"] = (round(n_reads / e2e_l, 1)
                                         if e2e_l else None)
            med_lp, spread_lp, _ = run_trials(
                ref, base + ["-7", fa, fq1, fq2], trials)
            e2e_lp = med_lp.get("mem_process_seq", med_lp["wall"])
            result["learned_stages_pe"] = med_lp
            result["learned_e2e_pe_rps"] = (round(2 * n_pe / e2e_lp, 1)
                                            if e2e_lp else None)

    path = os.path.join(cache, f"ref_baseline_{mbp}mbp.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
