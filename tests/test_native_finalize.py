"""Differential test: native batch finalization (finalize_se_c) vs the
Python contract (align/finalize.py + align/alt.py) — byte-identical SAM.

The Python implementation remains the documented reference (provenance
src/bwamem.cpp:194-2313); the native path must reproduce it exactly across
flag combinations, multi-contig references, ALT contigs, RC reads,
supplementary/secondary records, XA, and unmapped reads.
"""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.io.fastq import Read
from bwameme_tpu.pipeline import Aligner
from bwameme_tpu.utils.config import (MEM_F_ALL, MEM_F_KEEP_SUPP_MAPQ,
                                      MEM_F_NO_MULTI, MEM_F_PRIMARY5,
                                      MEM_F_SOFTCLIP, MemOptions)


@pytest.fixture(scope="module")
def world():
    from bwameme_tpu.align import native

    if not native.available():
        pytest.skip("native kernels unavailable (no g++)")
    rng = np.random.default_rng(2025)
    n1, n2 = 24000, 9000
    code = rng.integers(0, 4, n1 + n2).astype(np.uint8)
    # repeats spanning both contigs so secondaries/XA/SA fire
    code[4000:4800] = code[12000:12800]
    code[n1 + 2000: n1 + 2800] = code[12000:12800]
    code[20000:20300] = np.tile(code[20000:20050], 6)
    contigs = [
        bntseq.Contig("chrA", "", 0, n1, 0),
        bntseq.Contig("chrB_alt", "", n1, n2, 0),
    ]
    contigs[1].is_alt = True
    bns = bntseq.BntSeq(l_pac=n1 + n2, contigs=contigs, ambs=[], code=code)
    idx = build_index(bns, rmi_bits=10)

    chars = "ACGT"
    reads = []
    for i in range(48):
        ln = int(rng.integers(70, 151))
        st = int(rng.integers(0, idx.l_pac - ln - 1))
        c = idx.text[st: st + ln].copy()
        for _ in range(rng.poisson(1.2)):
            p = int(rng.integers(0, ln))
            c[p] = (c[p] + rng.integers(1, 4)) % 4
        if rng.random() < 0.2:  # indel-ish: chimeric splice for SA records
            st2 = int(rng.integers(0, idx.l_pac - ln - 1))
            cut = ln // 2
            c = np.concatenate([c[:cut], idx.text[st2: st2 + ln - cut]])
        if i % 3 == 0:
            c = (3 - c[::-1]).astype(np.uint8)
        comment = "BC:Z:ACGT" if i % 7 == 0 else None
        reads.append(Read(name=f"r{i:03d}", comment=comment,
                          seq="".join(chars[x] for x in c),
                          qual="".join(chr(33 + int(q))
                                       for q in rng.integers(2, 40, ln))))
    # one garbage read (unmapped line) and one N-heavy read
    reads.append(Read(name="junk", comment=None,
                      seq="".join(chars[x] for x in
                                  rng.integers(0, 4, 100)), qual="I" * 100))
    nn = list(reads[0].seq[:90])
    nn[10:20] = "N" * 10
    reads.append(Read(name="enn", comment=None, seq="".join(nn),
                      qual="I" * 90))
    return idx, reads


OPTS = [
    {},  # defaults
    {"flag": MEM_F_ALL},
    {"flag": MEM_F_SOFTCLIP},
    {"flag": MEM_F_NO_MULTI},
    {"flag": MEM_F_PRIMARY5 | MEM_F_KEEP_SUPP_MAPQ},
    {"T": 40},
    {"a": 2, "b": 8, "o_del": 12, "o_ins": 10, "e_del": 3, "e_ins": 2,
     "T": 17},
]


@pytest.mark.parametrize("ov", OPTS)
def test_native_finalize_matches_python(world, ov):
    idx, reads = world
    opt = MemOptions()
    for k, v in ov.items():
        setattr(opt, k, v)
    if {"a", "b"} & set(ov):
        from bwameme_tpu.utils.config import fill_scmat

        opt.mat = fill_scmat(opt.a, opt.b)
    al = Aligner(idx, opt, rg_id="rg7" if ov.get("T") else None)
    recs = [al._encode(r) for r in reads]
    smems = al.collect_smems(recs)
    regs = al._kernel2_finish(al._kernel2_submit(recs, smems))

    import copy

    from bwameme_tpu.align import native

    got = native.finalize_se_native(
        opt, idx.bns, idx.text, recs, copy.deepcopy(regs), al.rg_id, 1000)
    assert got is not None
    al.n_processed = 1000
    al._use_native_finalize = False
    want = al._finalize_se(recs, regs)
    assert got == want


def test_native_dedup_matches_python(world):
    """dedup_patch_batch_c vs finalize.sort_dedup_patch — identical kept
    regs (order + every field the dedup/patch can mutate)."""
    idx, reads = world
    opt = MemOptions()
    al = Aligner(idx, opt)
    recs = [al._encode(r) for r in reads]
    smems = al.collect_smems(recs)
    regs = al._kernel2_finish(al._kernel2_submit(recs, smems))

    import copy

    from bwameme_tpu.align import finalize, native

    regs_n = copy.deepcopy(regs)
    got = native.dedup_batch_native(opt, idx.bns, idx.text, recs, regs_n)
    assert got is not None
    n_multi = 0
    for rec, regs_i, kept in zip(recs, regs, got):
        want = finalize.sort_dedup_patch(
            opt, idx.bns, idx.text, rec.codes,
            [r for r in regs_i if r.qe > r.qb])
        assert len(kept) == len(want), rec.name
        if len(kept) > 1:
            n_multi += 1
        for a, b in zip(kept, want):
            for fld in ("rb", "re", "qb", "qe", "rid", "score", "truesc",
                        "sub", "csub", "w", "seedcov", "n_comp"):
                assert getattr(a, fld) == getattr(b, fld), (rec.name, fld)
    assert n_multi > 0  # the workload must actually exercise multi-reg dedup


@pytest.mark.slow
def test_native_pe_matches_python(world):
    """align_pairs with the native mem_pair+mem_sam_pe vs the Python
    contract — identical SAM (covers pairing mapq, TLEN/MC, proper-pair
    flags, XA on pairs, unmapped mates, no-pairing fallback)."""
    idx, _ = world
    rng = np.random.default_rng(77)
    chars = "ACGT"
    pairs = []
    for i in range(40):
        a = int(rng.integers(0, idx.l_pac - 600))
        ins = int(rng.integers(250, 450))
        c1 = idx.text[a: a + 100].copy()
        c2 = (3 - idx.text[a + ins - 100: a + ins][::-1]).astype(np.uint8)
        p = int(rng.integers(0, 100))
        c1[p] = (c1[p] + 1) % 4
        if i % 9 == 0:  # a garbage mate (unmapped/no-pairing paths)
            c2 = rng.integers(0, 4, 100).astype(np.uint8)
        for j, c in enumerate((c1, c2)):
            pairs.append(Read(name=f"p{i:03d}",
                              comment="BC:Z:TT" if i % 11 == 0 else None,
                              seq="".join(chars[x] for x in c),
                              qual="".join(chr(33 + int(q)) for q in
                                           rng.integers(2, 40, 100))))
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine

    opt = MemOptions()
    opt.flag |= 2  # MEM_F_PE
    sams = []
    for use_native in (True, False):
        eng = DeviceSeedingEngine(idx, opt, lanes=128)
        al = Aligner(idx, opt, seeding_engine=eng, rg_id="rgP")
        assert al.batched_rescue
        al._use_native_finalize = use_native
        sams.append(al.align_pairs(pairs))
    assert sams[0] == sams[1]
