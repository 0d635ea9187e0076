"""Library API tests (bwamem_extra analogs: mem_align1 / mem_reg2ovlp)."""

import numpy as np

from bwameme_tpu.align.extra import align1, reg2ovlp
from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.utils.config import MemOptions


def test_align1_and_reg2ovlp():
    rng = np.random.default_rng(9)
    n = 20000
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=11)
    opt = MemOptions()
    pos = 7000
    seq = "".join("ACGT"[c] for c in code[pos: pos + 100])
    regs = align1(idx, opt, seq)
    assert regs and regs[0].rb == pos and regs[0].re == pos + 100
    assert regs[0].score == 100 * opt.a
    hits = reg2ovlp(bns, 100, regs)
    assert hits and hits[0].rb == pos and hits[0].qe == 100
    assert not hits[0].is_rev
    # reverse strand
    rc = "".join("TGCA"["ACGT".find(c)] for c in reversed(seq))
    regs_rc = align1(idx, opt, rc)
    hits_rc = reg2ovlp(bns, 100, regs_rc)
    assert hits_rc and hits_rc[0].is_rev
