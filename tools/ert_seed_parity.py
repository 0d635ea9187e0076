"""Seed-level ERT parity vs the reference binary's ERT backend.

The reference's `test/ert_seeding_big_read` harness (built from
/root/reference/test/ERT_seeding_big_read.cpp, run with steps=4) prints,
per read, every SMEM produced by the ERT radix-tree walk
(src/ertseeding.cpp:3072-3435 get_seeds/reseed/last) as

    <read_id>:
    [qbeg,qend] [hit1,hit2,...]

with hits in doubled-text coordinates (backward-walk hits strand-folded
by the harness before printing). This tool replays the same reads through
THIS framework's seeding (host oracle and/or the device kmer-root engine
— index/ert.py's interval reformulation of the ERT) and emits the same
format, canonicalized: SMEM lines sorted by (qbeg, qend), hit lists
sorted ascending (the reference emits hits in tree-walk order, ours in
suffix-array order; the set per SMEM is the contract — downstream
chaining sorts seeds by coordinate either way,
src/bwamem.cpp:1029 mem_chain_new).

Usage:
    python tools/ert_seed_parity.py --ref ref.fa --reads reads.fq \
        [--engine host|device] [--canon-file reference_dump.txt]

With --canon-file, the reference dump is canonicalized the same way and
diffed; exit 1 on mismatch. tests/test_ert.py replays this against the
COMMITTED golden dump (tests/golden/ert_seeds.txt.gz).
"""

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NT4 = np.full(256, 4, np.uint8)
for _i, _c in enumerate("ACGT"):
    NT4[ord(_c)] = _i
    NT4[ord(_c.lower())] = _i


def read_fastq(path):
    op = gzip.open if path.endswith(".gz") else open
    reads = []
    with op(path, "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seq = f.readline().strip()
            f.readline()
            f.readline()
            reads.append(seq)
    return reads


def our_dump(ref_fa, reads, engine="host", min_seed_len=19, max_mem_intv=20):
    """Canonicalized seed dump lines for each read (list of str)."""
    from bwameme_tpu.index.bntseq import fasta_to_bntseq
    from bwameme_tpu.index.build import build_index
    from bwameme_tpu.utils.config import MemOptions

    bns = fasta_to_bntseq(ref_fa)
    idx = build_index(bns, rmi_bits=12)
    opt = MemOptions()
    opt.min_seed_len = min_seed_len
    opt.max_mem_intv = max_mem_intv

    if engine == "device":
        from bwameme_tpu.seeding.engine import DeviceSeedingEngine

        eng = DeviceSeedingEngine(idx, opt, root="kmer",
                                  lanes=min(256, len(reads)))
        codes = [NT4[np.frombuffer(s.encode(), np.uint8)] for s in reads]
        smems_per_read = eng.collect_smems_batch(codes)
    else:
        from bwameme_tpu.seeding.host_engine import HostSeedingEngine

        eng = HostSeedingEngine(idx, opt)
        smems_per_read = []
        for s in reads:
            codes = NT4[np.frombuffer(s.encode(), np.uint8)]
            smems_per_read.append(eng.collect_smems(codes))

    sa = idx.sa
    out = []
    for i, smems in enumerate(smems_per_read):
        out.append(f"{i}:")
        lines = []
        for sm in smems:
            hits = sorted(int(sa[r])
                          for r in range(sm.sa_lo, sm.sa_lo + sm.hitcount))
            lines.append(((sm.start, sm.end),
                          f"[{sm.start},{sm.end}] "
                          f"[{','.join(map(str, hits))},]"))
        lines.sort(key=lambda t: t[0])
        out.extend(l for _, l in lines)
    return out


def canonicalize_reference(lines):
    """Canonicalize a reference harness dump (steps=4 output): sort hit
    lists ascending, sort each read's SMEM lines by (qbeg, qend)."""
    out = []
    block = []

    def flush():
        block.sort(key=lambda t: t[0])
        out.extend(l for _, l in block)
        block.clear()

    for raw in lines:
        raw = raw.strip()
        if not raw:
            continue
        if raw.endswith(":") and "[" not in raw:
            flush()
            out.append(raw)
            continue
        # "[qbeg,qend] [h1,h2,...]"
        span, hits = raw.split("] [", 1)
        qbeg, qend = map(int, span[1:].split(","))
        hl = sorted(int(h) for h in hits.rstrip("]").split(",") if h)
        block.append(((qbeg, qend),
                      f"[{qbeg},{qend}] [{','.join(map(str, hl))},]"))
    flush()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True)
    ap.add_argument("--reads", required=True)
    ap.add_argument("--engine", default="host", choices=["host", "device"])
    ap.add_argument("--canon-file", default=None,
                    help="reference harness dump to canonicalize + diff")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    reads = read_fastq(args.reads)
    ours = our_dump(args.ref, reads, engine=args.engine)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(ours) + "\n")
    if args.canon_file:
        op = gzip.open if args.canon_file.endswith(".gz") else open
        with op(args.canon_file, "rt") as f:
            theirs = canonicalize_reference(f.read().splitlines())
        if ours != theirs:
            import difflib

            for d in list(difflib.unified_diff(theirs, ours,
                                               "reference", "ours"))[:60]:
                print(d, file=sys.stderr)
            n_bad = sum(1 for a, b in zip(ours, theirs) if a != b)
            print(f"MISMATCH ({n_bad} differing lines of {len(ours)})",
                  file=sys.stderr)
            return 1
        print(f"PARITY OK: {len(ours)} lines identical", file=sys.stderr)
    else:
        print("\n".join(ours))
    return 0


if __name__ == "__main__":
    sys.exit(main())
