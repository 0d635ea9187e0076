import numpy as np

from bwameme_tpu.index import bntseq


def test_lrand48_known_values():
    # lrand48 after srand48(11): values cross-checked against glibc
    r = bntseq.Lrand48(11)
    vals = [r.next() for _ in range(4)]
    # deterministic LCG: recompute independently
    x = (11 << 16) | 0x330E
    expect = []
    for _ in range(4):
        x = (x * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        expect.append(x >> 17)
    assert vals == expect


def _write_fasta(tmp_path, records):
    p = tmp_path / "ref.fa"
    with open(p, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i : i + 60] + "\n")
    return str(p)


def test_fasta_parse_basic(tmp_path):
    path = _write_fasta(tmp_path, [("chr1", "ACGTACGT"), ("chr2", "GGGGCCCC")])
    bns = bntseq.fasta_to_bntseq(path)
    assert bns.l_pac == 16
    assert bns.n_seqs == 2
    assert bns.contigs[0].name == "chr1"
    assert bns.contigs[1].offset == 8
    assert list(bns.code[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]


def test_fasta_amb_runs(tmp_path):
    path = _write_fasta(tmp_path, [("c", "ACNNNGTNACGTRRA")])
    bns = bntseq.fasta_to_bntseq(path)
    # runs: NNN at 2, N at 7, RR at 12
    assert [(a.offset, a.length, a.amb) for a in bns.ambs] == [
        (2, 3, "N"), (7, 1, "N"), (12, 2, "R"),
    ]
    assert bns.contigs[0].n_ambs == 3
    # ambiguous bases replaced deterministically by lrand48()&3
    r = bntseq.Lrand48(11)
    draws = [r.next() & 3 for _ in range(6)]
    amb_pos = [2, 3, 4, 7, 12, 13]
    assert [int(bns.code[p]) for p in amb_pos] == draws


def test_dump_restore_roundtrip(tmp_path):
    path = _write_fasta(tmp_path, [("chr1", "ACGTNNACGTACGT"), ("chr2", "TTTTGGGG")])
    bns = bntseq.fasta_to_bntseq(path)
    prefix = str(tmp_path / "ref.fa")
    bntseq.dump(bns, prefix)
    bns2 = bntseq.restore(prefix)
    assert bns2.l_pac == bns.l_pac
    assert [c.name for c in bns2.contigs] == ["chr1", "chr2"]
    assert np.array_equal(bns2.code, bns.code)
    assert len(bns2.ambs) == len(bns.ambs)


def test_pos2rid_intv2rid(tmp_path):
    path = _write_fasta(tmp_path, [("a", "A" * 10), ("b", "C" * 10)])
    bns = bntseq.fasta_to_bntseq(path)
    assert bns.pos2rid(0) == 0
    assert bns.pos2rid(9) == 0
    assert bns.pos2rid(10) == 1
    assert bns.pos2rid(19) == 1
    assert bns.intv2rid(8, 12) == -1       # bridges contigs
    assert bns.intv2rid(2, 8) == 0
    assert bns.intv2rid(12, 18) == 1
    # reverse-strand interval (coordinates in [l_pac, 2*l_pac))
    assert bns.intv2rid(22, 28) == 1       # folds onto contig b? depends on fold
    assert bns.intv2rid(18, 22) == -1      # bridges fwd/rev boundary
