"""End-to-end paired-end pipeline tests."""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.io.fastq import Read
from bwameme_tpu.io.sam import (
    FLAG_MREVERSE, FLAG_PAIRED, FLAG_PROPER_PAIR, FLAG_READ1, FLAG_READ2,
    FLAG_REVERSE, FLAG_UNMAP,
)
from bwameme_tpu.pipeline import Aligner
from bwameme_tpu.utils.config import MEM_F_PE, MemOptions


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(321)
    n = 50000
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("chrP", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=11)
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    return idx, Aligner(idx, opt), rng


def make_pairs(idx, rng, n_pairs, isize_mean=300, isize_sd=25, rlen=100,
               mut=0.005):
    """FR-orientation pairs: R1 forward at p, R2 = RC of [p+isize-rlen, ...)."""
    reads = []
    truths = []
    for i in range(n_pairs):
        isize = int(rng.normal(isize_mean, isize_sd))
        p = int(rng.integers(0, idx.l_pac - isize - rlen - 2))
        r1 = idx.text[p: p + rlen].copy()
        r2f = idx.text[p + isize - rlen: p + isize].copy()
        for arr in (r1, r2f):
            for j in range(rlen):
                if rng.random() < mut:
                    arr[j] = (arr[j] + rng.integers(1, 4)) % 4
        r2 = (3 - r2f[::-1]).astype(np.uint8)
        q = "I" * rlen
        reads.append(Read(f"pair{i}", "".join("ACGT"[c] for c in r1), q, None))
        reads.append(Read(f"pair{i}", "".join("ACGT"[c] for c in r2), q, None))
        truths.append((p, p + isize - rlen, isize))
    return reads, truths


def _parse_all(blocks):
    recs = []
    for b in blocks:
        for line in b.strip("\n").split("\n"):
            f = line.split("\t")
            recs.append(dict(qname=f[0], flag=int(f[1]), rname=f[2],
                             pos=int(f[3]), mapq=int(f[4]), cigar=f[5],
                             rnext=f[6], pnext=int(f[7]), tlen=int(f[8])))
    return recs


def test_proper_pairs(setup):
    idx, aligner, rng = setup
    reads, truths = make_pairs(idx, rng, 40)
    blocks = aligner.align_pairs(reads)
    recs = _parse_all(blocks)
    primary = [r for r in recs if not (r["flag"] & 0x900)]
    assert len(primary) == 80
    n_proper = sum(1 for r in primary if r["flag"] & FLAG_PROPER_PAIR)
    assert n_proper >= 70, n_proper
    # check a few positions + TLEN
    by_name = {}
    for r in primary:
        by_name.setdefault(r["qname"], []).append(r)
    for i, (p1, p2, isize) in enumerate(truths[:10]):
        rs = by_name[f"pair{i}"]
        assert len(rs) == 2
        r1 = next(r for r in rs if r["flag"] & FLAG_READ1)
        r2 = next(r for r in rs if r["flag"] & FLAG_READ2)
        assert r1["pos"] == p1 + 1, (i, r1)
        assert r2["pos"] == p2 + 1, (i, r2)
        assert r1["flag"] & FLAG_MREVERSE
        assert r2["flag"] & FLAG_REVERSE
        assert r1["rnext"] == "="
        assert r1["tlen"] == isize
        assert r2["tlen"] == -isize


def test_mate_rescue(setup):
    idx, aligner, rng = setup
    # R2 heavily mutated so seeding fails, but mate-SW should place it
    reads, truths = make_pairs(idx, rng, 12)
    # need enough clean pairs for pestat; corrupt only the last pair's R2
    r2 = reads[-1]
    codes = np.frombuffer(r2.seq.encode(), np.uint8)
    from bwameme_tpu.index.packing import NT4_TABLE
    c = NT4_TABLE[codes].copy()
    rng2 = np.random.default_rng(9)
    for j in range(0, 100, 11):  # mutate every 11th base: kills 19bp seeds
        c[j] = (c[j] + 1) % 4
    reads[-1] = Read(r2.name, "".join("ACGT"[x] for x in c), r2.qual, None)
    blocks = aligner.align_pairs(reads)
    recs = _parse_all(blocks)
    last = [r for r in recs if r["qname"] == f"pair{len(truths)-1}"
            and not (r["flag"] & 0x900)]
    r2rec = next(r for r in last if r["flag"] & FLAG_READ2)
    assert not (r2rec["flag"] & FLAG_UNMAP), r2rec
    p2 = truths[-1][1]
    assert abs(r2rec["pos"] - (p2 + 1)) <= 5, (r2rec, p2)


def test_one_end_unmapped(setup):
    idx, aligner, rng = setup
    reads, truths = make_pairs(idx, rng, 11)
    garbage = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    reads[-1] = Read(reads[-1].name, garbage, "I" * 100, None)
    blocks = aligner.align_pairs(reads)
    recs = _parse_all(blocks)
    last = [r for r in recs if r["qname"] == f"pair{len(truths)-1}"]
    r2rec = next(r for r in last if r["flag"] & FLAG_READ2)
    # either rescued near the mate or unmapped-with-mate-coordinates
    assert r2rec["flag"] & FLAG_PAIRED
    if r2rec["flag"] & FLAG_UNMAP:
        r1rec = next(r for r in last if r["flag"] & FLAG_READ1)
        assert r2rec["rname"] != "*" or r1rec["flag"] & FLAG_UNMAP


def test_batched_mate_rescue_matches_serial(setup):
    """Chunk-wide batched kswv rescue must match the serial mem_matesw path
    on a chunk without cascading rescues."""
    idx, aligner, rng = setup
    from bwameme_tpu.pipeline import Aligner

    reads = []
    n = idx.l_pac
    for i in range(6):
        pos = int(rng.integers(200, n - 700))
        isize = int(rng.integers(250, 400))
        c1 = idx.text[pos: pos + 100].copy()
        c2 = (3 - idx.text[pos + isize - 100: pos + isize][::-1]).astype("uint8")
        # knock out one mate's seeds to force a rescue for some pairs
        if i % 3 == 0:
            c2[10:90:7] = (c2[10:90:7] + 1) % 4
        s1 = "".join("ACGT"[x] for x in c1)
        s2 = "".join("ACGT"[x] for x in c2)
        from bwameme_tpu.io.fastq import Read
        reads.append(Read(f"p{i}", s1, "I" * 100, None))
        reads.append(Read(f"p{i}", s2, "I" * 100, None))
    serial = Aligner(idx, aligner.opt, batched_rescue=False)
    batched = Aligner(idx, aligner.opt, batched_rescue=True)
    assert serial.align_pairs(reads) == batched.align_pairs(reads)
