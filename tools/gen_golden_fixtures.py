"""Generate the committed golden-SAM fixtures from the reference binary.

Run once (or whenever the fixture configs change) on a machine with the
reference binary built (tools/build_reference.sh):

    python tools/gen_golden_fixtures.py [REF_BIN]

Writes tests/golden/: ref.fa.gz, reads_se.fq.gz, reads_1.fq.gz,
reads_2.fq.gz and one <name>.sam.gz per config in CONFIGS. The goldens
are the reference binary's output under `-Y -K 100000000 -t 1` style
deterministic settings (reference: README.md:80-92 — SAM diff-equality
is the product correctness contract; -K fixes chunking so output is
thread-count independent, fastmap.cpp:1180).

tests/test_golden_sam.py replays these without needing the binary.
"""

import gzip
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden")

# Each config: (name, extra mem flags). All get -K 100000000 for
# deterministic chunking. The list covers: soft-clip supplementary (-Y),
# default hard-clip, all-hits (-a) which exposes secondary/tie order,
# score threshold, -5 primary reorder, and paired-end.
CONFIGS = [
    ("se_Y", ["-Y"], "se"),
    ("se_default", [], "se"),
    ("se_all", ["-a", "-Y"], "se"),
    ("se_T40", ["-T", "40"], "se"),
    ("se_5", ["-5", "-Y"], "se"),
    ("se_x_intractg", ["-x", "intractg"], "se"),
    ("pe_Y", ["-Y"], "pe"),
    ("pe_default", [], "pe"),
]


def make_contig(rng, n=120_000):
    chars = np.array(list("ACGT"))
    code = rng.integers(0, 4, n)
    for _ in range(20):
        src = int(rng.integers(0, n - 3000))
        dst = int(rng.integers(0, n - 3000))
        ln = int(rng.integers(200, 2000))
        code[dst: dst + ln] = code[src: src + ln]
    s = "".join(chars[code])
    return s[:60000] + "N" * 37 + s[60000:]


def rc(x):
    return x[::-1].translate(str.maketrans("ACGTN", "TGCAN"))


def mutate(rng, r, chars):
    r = list(r)
    for _ in range(rng.poisson(1.2)):
        p = int(rng.integers(0, len(r)))
        r[p] = chars[int(rng.integers(0, 4))]
    return "".join(r)


def gen_se(rng, s, n_reads=300, L=151):
    chars = np.array(list("ACGT"))
    out = []
    cnt = 0
    while cnt < n_reads:
        a = int(rng.integers(0, len(s) - L))
        r = s[a: a + L]
        if "N" in r and rng.random() < 0.7:
            continue
        r = mutate(rng, r, chars)
        if rng.random() < 0.25:
            cut = int(rng.integers(20, L - 20))
            ln = int(rng.integers(1, 5))
            r = r[:cut] + r[cut + ln:]
        if rng.random() < 0.5:
            r = rc(r)
        out.append(f"@r{cnt}\n{r}\n+\n{'I' * len(r)}\n")
        cnt += 1
    return "".join(out)


def gen_pe(rng, s, n_pairs=200, L=151):
    chars = np.array(list("ACGT"))
    o1, o2 = [], []
    cnt = 0
    while cnt < n_pairs:
        isize = int(rng.normal(420, 60))
        if isize < 2 * L + 10:
            continue
        a = int(rng.integers(0, len(s) - isize))
        frag = s[a: a + isize]
        if "N" in frag and rng.random() < 0.7:
            continue
        r1 = mutate(rng, frag[:L], chars)
        r2 = mutate(rng, rc(frag[-L:]), chars)
        if rng.random() < 0.5:
            r1, r2 = r2, r1
        o1.append(f"@p{cnt}\n{r1}\n+\n{'I' * len(r1)}\n")
        o2.append(f"@p{cnt}\n{r2}\n+\n{'I' * len(r2)}\n")
        cnt += 1
    return "".join(o1), "".join(o2)


def main():
    ref_bin = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "BWAMEME_REF_BIN", "/tmp/refbuild/bwa-meme")
    assert os.path.exists(ref_bin), f"reference binary not at {ref_bin}"
    os.makedirs(GOLD, exist_ok=True)

    rng = np.random.default_rng(20260817)
    s = make_contig(rng)
    fa = ">chrG golden contig\n" + "\n".join(
        s[i: i + 80] for i in range(0, len(s), 80)) + "\n"
    se = gen_se(rng, s)
    p1, p2 = gen_pe(rng, s)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        fap = os.path.join(td, "ref.fa")
        for name, text in [("ref.fa", fa), ("reads_se.fq", se),
                           ("reads_1.fq", p1), ("reads_2.fq", p2)]:
            with open(os.path.join(td, name), "w") as f:
                f.write(text)
            with gzip.open(os.path.join(GOLD, name + ".gz"), "wt") as f:
                f.write(text)
        subprocess.run([ref_bin, "index", "-a", "mem2", fap], check=True,
                       capture_output=True)
        for name, flags, mode in CONFIGS:
            reads = ([os.path.join(td, "reads_se.fq")] if mode == "se" else
                     [os.path.join(td, "reads_1.fq"),
                      os.path.join(td, "reads_2.fq")])
            out = subprocess.run(
                [ref_bin, "mem", "-K", "100000000", "-t", "1", *flags,
                 fap, *reads],
                check=True, capture_output=True, text=True)
            recs = [ln for ln in out.stdout.splitlines()
                    if not ln.startswith("@")]
            with gzip.open(os.path.join(GOLD, name + ".sam.gz"), "wt") as f:
                f.write("\n".join(recs) + "\n")
            print(f"{name}: {len(recs)} records")


if __name__ == "__main__":
    main()
