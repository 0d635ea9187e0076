"""End-to-end single-end pipeline tests on a synthetic reference."""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.io.fastq import Read
from bwameme_tpu.pipeline import Aligner


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(123)
    n = 20000
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("chrT", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=10)
    return idx, Aligner(idx), rng


def _mk_read(idx, start, length, rng, nmut=0, rc=False, name="r"):
    codes = idx.text[start : start + length].copy()
    for _ in range(nmut):
        p = int(rng.integers(0, length))
        codes[p] = (codes[p] + rng.integers(1, 4)) % 4
    if rc:
        codes = (3 - codes[::-1]).astype(np.uint8)
    seq = "".join("ACGT"[c] for c in codes)
    return Read(name, seq, "I" * length, None)


def _parse(sam_block):
    recs = []
    for line in sam_block.strip("\n").split("\n"):
        f = line.split("\t")
        recs.append(
            dict(qname=f[0], flag=int(f[1]), rname=f[2], pos=int(f[3]),
                 mapq=int(f[4]), cigar=f[5], seq=f[9],
                 tags={t.split(":", 1)[0]: t.split(":", 2)[2] for t in f[11:]})
        )
    return recs


def test_perfect_read(setup):
    idx, aligner, rng = setup
    read = _mk_read(idx, 5000, 100, rng, name="perfect")
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["rname"] == "chrT"
    assert r["pos"] == 5001
    assert r["cigar"] == "100M"
    assert r["flag"] == 0
    assert r["tags"]["NM"] == "0"
    assert r["tags"]["MD"] == "100"
    assert r["tags"]["AS"] == "100"
    assert r["mapq"] == 60
    assert r["seq"] == read.seq


def test_snp_read(setup):
    idx, aligner, rng = setup
    read = _mk_read(idx, 7000, 100, rng, name="snp")
    # force one mismatch at position 50
    codes = idx.text[7000:7100].copy()
    codes[50] = (codes[50] + 1) % 4
    read = Read("snp", "".join("ACGT"[c] for c in codes), "I" * 100, None)
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["pos"] == 7001
    assert r["cigar"] == "100M"
    assert r["tags"]["NM"] == "1"
    assert r["tags"]["AS"] == str(100 - 5)  # 99 match +1 each, -4 mismatch
    assert "50" in r["tags"]["MD"]


def test_reverse_strand(setup):
    idx, aligner, rng = setup
    read = _mk_read(idx, 3000, 100, rng, rc=True, name="rev")
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["flag"] & 0x10
    assert r["pos"] == 3001
    assert r["cigar"] == "100M"
    # SEQ in SAM is reference-forward orientation = RC of the read
    fwd = idx.text[3000:3100]
    assert r["seq"] == "".join("ACGT"[c] for c in fwd)


def test_insertion_read(setup):
    idx, aligner, rng = setup
    codes = idx.text[9000:9100].copy()
    ins = np.array([0, 1, 2], dtype=np.uint8)
    codes2 = np.concatenate([codes[:50], ins, codes[50:]])
    read = Read("ins", "".join("ACGT"[c] for c in codes2), "I" * len(codes2), None)
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["pos"] == 9001
    # exact placement of the insertion depends on DP tie-breaking (content-
    # dependent); require a single 3bp insertion with 100 aligned bases
    import re

    m = re.fullmatch(r"(\d+)M3I(\d+)M", r["cigar"])
    assert m, r["cigar"]
    assert int(m.group(1)) + int(m.group(2)) == 100


def test_deletion_read(setup):
    idx, aligner, rng = setup
    codes = idx.text[11000:11104].copy()
    codes2 = np.concatenate([codes[:50], codes[54:]])  # delete 4bp
    read = Read("del", "".join("ACGT"[c] for c in codes2), "I" * len(codes2), None)
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["pos"] == 11001
    import re

    m = re.fullmatch(r"(\d+)M4D(\d+)M", r["cigar"])
    assert m, r["cigar"]
    assert int(m.group(1)) + int(m.group(2)) == 100
    assert r["tags"]["NM"] == "4"


def test_unmapped_read(setup):
    idx, aligner, rng = setup
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    read = Read("unmapped", seq, "I" * 100, None)
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["flag"] & 0x4
    assert r["rname"] == "*"
    assert r["cigar"] == "*"


def test_softclip_read(setup):
    idx, aligner, rng = setup
    # 30bp garbage + 70bp real: expect soft clip at 5'
    garbage = "".join("ACGT"[c] for c in rng.integers(0, 4, 30))
    real = "".join("ACGT"[c] for c in idx.text[13000:13070])
    read = Read("clip", garbage + real, "I" * 100, None)
    [sam] = aligner.align_batch([read])
    [r] = _parse(sam)
    assert r["pos"] == 13001
    assert r["cigar"] == "30S70M", r["cigar"]


def test_batch_of_reads(setup):
    idx, aligner, rng = setup
    reads = [
        _mk_read(idx, int(rng.integers(0, idx.l_pac - 150)), 100, rng,
                 nmut=int(rng.integers(0, 3)), rc=bool(rng.integers(0, 2)),
                 name=f"r{i}")
        for i in range(20)
    ]
    sams = aligner.align_batch(reads)
    assert len(sams) == 20
    mapped = sum(1 for s in sams if not (int(s.split("\t")[1]) & 0x4))
    assert mapped >= 18  # nearly all map


def test_pipeline_with_device_engine(setup):
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine

    idx, _, rng = setup
    from bwameme_tpu.pipeline import Aligner

    dev_aligner = Aligner(idx, seeding_engine=DeviceSeedingEngine(idx, Aligner(idx).opt))
    host_aligner = Aligner(idx)
    reads = [
        _mk_read(idx, int(rng.integers(0, idx.l_pac - 150)), 100, rng,
                 nmut=int(rng.integers(0, 3)), rc=bool(rng.integers(0, 2)),
                 name=f"d{i}")
        for i in range(10)
    ]
    sam_dev = dev_aligner.align_batch(reads)
    sam_host = host_aligner.align_batch(reads)
    assert sam_dev == sam_host


def test_xa_tag_on_duplicated_region(setup):
    idx, aligner, rng = setup
    # create a read from a region duplicated in the reference? synthetic ref
    # has no exact dups, so build a tiny two-copy reference here
    from bwameme_tpu.index import bntseq as bmod
    from bwameme_tpu.index.build import build_index as bld

    rng2 = np.random.default_rng(55)
    seg = rng2.integers(0, 4, 500).astype(np.uint8)
    filler = rng2.integers(0, 4, 2000).astype(np.uint8)
    code = np.concatenate([seg, filler, seg, filler[:500]])
    bns = bmod.BntSeq(l_pac=len(code),
                      contigs=[bmod.Contig("dup", "", 0, len(code), 0)],
                      ambs=[], code=code)
    idx2 = bld(bns, rmi_bits=8)
    al = Aligner(idx2)
    read = Read("dupread", "".join("ACGT"[c] for c in seg[100:200]), "I" * 100, None)
    [sam] = al.align_batch([read])
    [r] = _parse(sam)
    assert r["mapq"] == 0  # two equally good hits
    assert "XA" in r["tags"], r
    # XA names the other copy
    assert r["tags"]["XA"].count(";") == 1
    other_pos = int(r["tags"]["XA"].split(",")[1])
    positions = sorted([r["pos"], abs(other_pos)])
    assert positions == [101, 2601], (positions, r)


@pytest.mark.slow
def test_align_stream_matches_align_batch(setup):
    idx, aligner, rng = setup
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.pipeline import Aligner

    reads = [_mk_read(idx, 1000 + 300 * i, 100, rng, nmut=1, rc=bool(i % 2),
                      name=f"s{i}") for i in range(10)]
    a1 = Aligner(idx, seeding_engine=DeviceSeedingEngine(idx, aligner.opt,
                                                         lanes=256))
    a2 = Aligner(idx, seeding_engine=DeviceSeedingEngine(idx, aligner.opt,
                                                         lanes=256))
    want = []
    for i in range(0, 10, 4):
        want.extend(a1.align_batch(reads[i: i + 4]))
    got = []
    for blocks in a2.align_stream(reads[i: i + 4] for i in range(0, 10, 4)):
        got.extend(blocks)
    assert got == want
