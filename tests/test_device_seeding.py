"""Differential test: device (JAX) seeding engine vs host scalar engine —
the compare_result.sh pattern (reference: test/compare_result.sh) with the
host engine as the oracle."""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.seeding.engine import DeviceSeedingEngine
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils.config import MemOptions


@pytest.fixture(scope="module")
def engines():
    rng = np.random.default_rng(77)
    n = 30000
    code = rng.integers(0, 4, n).astype(np.uint8)
    # add some repetitive structure to exercise interval widening
    code[10000:10400] = np.tile(code[10000:10050], 8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=11)
    opt = MemOptions()
    return HostSeedingEngine(idx, opt), DeviceSeedingEngine(idx, opt), idx, rng


def _cmp(host_eng, dev_eng, reads):
    host = [host_eng.sorted_smems(c) for c in reads]
    dev = dev_eng.sorted_smems_batch(reads)
    for ri, (h, d) in enumerate(zip(host, dev)):
        hs = [(s.start, s.end, s.sa_lo, s.hitcount) for s in h]
        ds = [(s.start, s.end, s.sa_lo, s.hitcount) for s in d]
        assert hs == ds, (ri, hs, ds)


def test_sampled_reads(engines):
    host_eng, dev_eng, idx, rng = engines
    reads = []
    for _ in range(12):
        st = int(rng.integers(0, idx.l_pac - 150))
        c = idx.text[st : st + 120].copy()
        for _ in range(int(rng.integers(0, 4))):
            pp = int(rng.integers(0, 120))
            c[pp] = (c[pp] + rng.integers(1, 4)) % 4
        reads.append(c)
    _cmp(host_eng, dev_eng, reads)


def test_rc_and_random_reads(engines):
    host_eng, dev_eng, idx, rng = engines
    reads = []
    for i in range(8):
        st = int(rng.integers(0, idx.l_pac - 150))
        c = idx.text[st : st + 101].copy()
        if i % 2:
            c = (3 - c[::-1]).astype(np.uint8)
        reads.append(c)
    reads.append(rng.integers(0, 4, 100).astype(np.uint8))  # garbage
    _cmp(host_eng, dev_eng, reads)


def test_repetitive_region_reads(engines):
    host_eng, dev_eng, idx, rng = engines
    # reads from the repetitive block: many hits, interval widening, reseeding
    reads = [idx.text[10000 + k * 37 : 10000 + k * 37 + 100].copy() for k in range(5)]
    _cmp(host_eng, dev_eng, reads)


def test_reads_with_n(engines):
    host_eng, dev_eng, idx, rng = engines
    reads = []
    for k in range(5):
        st = int(rng.integers(0, idx.l_pac - 150))
        c = idx.text[st : st + 110].copy()
        for _ in range(int(rng.integers(1, 4))):
            c[int(rng.integers(0, 110))] = 4
        reads.append(c)
    _cmp(host_eng, dev_eng, reads)


def test_short_and_edge_reads(engines):
    host_eng, dev_eng, idx, rng = engines
    reads = [
        idx.text[:60].copy(),                       # start of text
        idx.text[idx.l_pac - 60 : idx.l_pac].copy(),  # end of fwd strand
        idx.text[100:118].copy(),                    # shorter than min_seed
        np.zeros(40, np.uint8),                      # poly-A
    ]
    _cmp(host_eng, dev_eng, reads)


def test_fully_fused_steps_parity(engines):
    """Steps 2+3 as single fused dispatches must equal the host-driven
    waves (production defaults run fused; tests default host-driven)."""
    host, dev, idx, rng = engines
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine

    fused = DeviceSeedingEngine(idx, dev.opt, lanes=dev.lanes)
    fused.fuse_step2 = True
    fused.fuse_step3 = True
    reads = []
    for t in range(6):
        pos = int(rng.integers(0, idx.l_pac - 130))
        r = idx.text[pos: pos + 100].copy()
        r[int(rng.integers(0, 100))] = int(rng.integers(0, 4))
        if t % 3 == 0:
            r[int(rng.integers(0, 100))] = 4
        reads.append(r)
    a = fused.sorted_smems_batch(reads)
    b = dev.sorted_smems_batch(reads)
    for x, y in zip(a, b):
        assert [(s.start, s.end, s.sa_lo, s.hitcount) for s in x] == \
               [(s.start, s.end, s.sa_lo, s.hitcount) for s in y]

    # the packed/compacted transfer (flat struct) must carry the exact same
    # SMEMs in the same (start, end)-sorted per-read order
    flat = fused.sorted_smems_batch_flat(reads)
    assert flat is not None
    for i, x in enumerate(a):
        got = [
            (int(flat.start[k]), int(flat.end[k]), int(flat.sa_lo[k]),
             int(flat.hitcount[k]))
            for k in range(int(flat.off[i]), int(flat.off[i + 1]))
        ]
        assert got == [(s.start, s.end, s.sa_lo, s.hitcount) for s in x]


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_memory_tier_parity(engines, mode):
    """MODE tiers (reference MODE=1/2/3 memory axis): the positions-only,
    rank-key and ktext layouts seed identically to the default (mode-4
    fused rank-row) layout the other tests exercise."""
    host_eng, _dev_eng, idx, rng = engines
    eng = DeviceSeedingEngine(idx, MemOptions(), lanes=256, mode=mode)
    reads = []
    for _ in range(8):
        st = int(rng.integers(0, idx.l_pac - 150))
        c = idx.text[st: st + 130].copy()
        p = int(rng.integers(0, 130))
        c[p] = (c[p] + 1) % 4
        reads.append(c)
    host = [host_eng.sorted_smems(c) for c in reads]
    dev = eng.sorted_smems_batch(reads)
    for ri, (h, d) in enumerate(zip(host, dev)):
        hs = [(s.start, s.end, s.sa_lo, s.hitcount) for s in h]
        ds = [(s.start, s.end, s.sa_lo, s.hitcount) for s in d]
        assert hs == ds, (mode, ri, hs, ds)


def test_over_int31_suffixes_need_wide():
    """Texts past 2^31 suffixes must fail loudly unless wide (int64) mode
    is on (VERDICT #2: silent overflow is forbidden). Forcing wide=False
    rejects; auto-wide without x64 demands the x64 switch."""
    from types import SimpleNamespace

    from bwameme_tpu.ops.sa_search import DeviceIndex

    fake = SimpleNamespace(n_sa=2**31, isa=None)
    with pytest.raises(ValueError, match="wide=True"):
        DeviceIndex.from_host(fake, wide=False)
    import jax

    if not jax.config.jax_enable_x64:
        with pytest.raises(ValueError, match="x64"):
            DeviceIndex.from_host(fake)
