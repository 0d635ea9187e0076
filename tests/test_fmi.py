"""FM-index backend tests.

Mirror of the reference's differential strategy (test/compare_result.sh):
the FMI backend must produce the same SMEM sets as the learned-index engine,
and the device kernels must match the host contract exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.index.fmindex import build_fm_index, load_fm_index, save_fm_index
from bwameme_tpu.ops.fmi_search import DeviceFmIndex, make_fmi_fns
from bwameme_tpu.seeding.fmi_engine import FmiDeviceEngine, FmiHostEngine
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils.config import MemOptions


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(11)
    n = 3000
    code = rng.integers(0, 4, n).astype(np.uint8)
    code[500:560] = code[1500:1560]  # a repeat
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=10)
    fm = build_fm_index(code)
    opt = MemOptions()
    opt.min_seed_len = 12
    opt.max_mem_intv = 20
    return idx, fm, opt, code, rng


def test_fm_build_vs_bruteforce():
    rng = np.random.default_rng(3)
    code = rng.integers(0, 4, 300).astype(np.uint8)
    fm = build_fm_index(code)
    textF = np.concatenate([code, (3 - code[::-1]).astype(np.uint8)])
    n = len(textF)
    sufs = [textF[i:].tobytes() for i in range(n)] + [b""]
    order = sorted(range(n + 1), key=lambda i: sufs[i])
    sa_bf = np.array([(i if i < n else n) for i in order])
    assert np.array_equal(sa_bf, fm.sa)
    for b in range(4):
        occ_bf = np.concatenate([[0], np.cumsum(fm.bwt == b)])
        for p in [0, 1, 63, 64, 65, 100, n, n + 1]:
            assert fm.occ(b, p) == occ_bf[p]
    # counts: count[b] = 1 + #chars < b
    assert fm.count[0] == 1 and fm.count[4] == n + 1


def test_extensions_vs_bruteforce(small):
    idx, fm, opt, code, rng = small
    eng = FmiHostEngine(idx, opt, fm=fm)
    textF = np.concatenate([code, (3 - code[::-1]).astype(np.uint8)])
    n = len(textF)

    def bf_interval(pat):
        m = [r for r in range(n + 1)
             if fm.sa[r] + len(pat) <= n
             and textF[fm.sa[r]: fm.sa[r] + len(pat)].tobytes() == pat.tobytes()]
        return (min(m), len(m)) if m else (0, 0)

    for _ in range(80):
        plen = int(rng.integers(1, 12))
        pat = rng.integers(0, 4, plen).astype(np.uint8)
        lb, cnt = bf_interval(pat)
        # backward
        k, l, s = eng._init_intv(int(pat[-1]))
        for a in pat[-2::-1]:
            k, l, s = eng.backward_ext(k, l, s, int(a))
            if s <= 0:
                break
        assert (s > 0 and (k, s) == (lb, cnt)) or (s <= 0 and cnt == 0)
        # forward
        k, l, s = eng._init_intv(int(pat[0]))
        for a in pat[1:]:
            k, l, s = eng.forward_ext(k, l, s, int(a))
            if s <= 0:
                break
        assert (s > 0 and (k, s) == (lb, cnt)) or (s <= 0 and cnt == 0)


def test_compressed_sa_lookup(small):
    idx, fm, opt, code, rng = small
    for r in rng.integers(0, fm.n + 1, 100):
        assert fm.get_sa_entry_compressed(int(r)) == int(fm.sa[r])


def test_device_kernels_match_host(small):
    idx, fm, opt, code, rng = small
    host = FmiHostEngine(idx, opt, fm=fm)
    dfm = DeviceFmIndex.from_host(fm)
    fns = make_fmi_fns(dfm)
    B = 128
    ks = rng.integers(0, fm.n + 1, B).astype(np.int32)
    ss = np.minimum(rng.integers(0, 50, B), fm.n + 1 - ks).astype(np.int32)
    ls = rng.integers(0, fm.n + 1, B).astype(np.int32)
    aa = rng.integers(0, 4, B).astype(np.int32)
    nk, nl, ns = fns["backward_ext"](
        dfm, jnp.asarray(ks), jnp.asarray(ls), jnp.asarray(ss), jnp.asarray(aa))
    for t in range(B):
        want = host.backward_ext(int(ks[t]), int(ls[t]), int(ss[t]), int(aa[t]))
        assert (int(nk[t]), int(nl[t]), int(ns[t])) == want
    ranks = rng.integers(0, fm.n + 1, 256).astype(np.int32)
    got = np.asarray(fns["sa_lookup"](dfm, jnp.asarray(ranks)))
    assert np.array_equal(got, fm.sa[ranks])


def test_fmi_vs_learned_differential(small):
    """The compare_result.sh pattern: FMI and learned backends must agree on
    (start, end, hitcount) and on hit-position sets."""
    idx, fm, opt, code, rng = small
    learned = HostSeedingEngine(idx, opt)
    fmi = FmiHostEngine(idx, opt, fm=fm)
    n = len(code)
    for t in range(25):
        pos = int(rng.integers(0, n - 120))
        read = code[pos: pos + 100].copy()
        for _ in range(3):
            read[rng.integers(0, 100)] = rng.integers(0, 4)
        if t % 6 == 0:
            read[rng.integers(0, 100)] = 4
        a = learned.sorted_smems(read)
        b = fmi.sorted_smems(read)
        assert sorted((s.start, s.end, s.hitcount) for s in a) == \
               sorted((s.start, s.end, s.hitcount) for s in b)
        for sa_, sb_ in zip(a, b):
            ha = sorted(int(idx.sa[sa_.sa_lo + i]) for i in range(sa_.hitcount))
            hb = sorted(int(fm.sa[sb_.sa_lo + i]) for i in range(sb_.hitcount))
            assert ha == hb


def test_device_engine_matches_host_engine(small):
    idx, fm, opt, code, rng = small
    host = FmiHostEngine(idx, opt, fm=fm)
    dev = FmiDeviceEngine(idx, opt, fm=fm, lanes=512)
    n = len(code)
    reads = []
    for t in range(10):
        pos = int(rng.integers(0, n - 120))
        read = code[pos: pos + 80].copy()
        for _ in range(2):
            read[rng.integers(0, 80)] = rng.integers(0, 4)
        if t % 4 == 0:
            read[rng.integers(0, 80)] = 4
        reads.append(read)
    hs = host.sorted_smems_batch(reads)
    ds = dev.sorted_smems_batch(reads)
    for a, b in zip(hs, ds):
        assert [(s.start, s.end, s.sa_lo, s.hitcount) for s in a] == \
               [(s.start, s.end, s.sa_lo, s.hitcount) for s in b]


def test_save_load_roundtrip(tmp_path, small):
    idx, fm, opt, code, rng = small
    prefix = str(tmp_path / "t")
    save_fm_index(prefix, fm)
    fm2 = load_fm_index(prefix)
    assert fm2.n == fm.n
    assert np.array_equal(fm2.sa, fm.sa)
    assert np.array_equal(fm2.cp_bits, fm.cp_bits)
    assert fm2.sentinel_index == fm.sentinel_index


def test_pipeline_with_fmi_backend(small):
    from bwameme_tpu.io.fastq import Read
    from bwameme_tpu.pipeline import Aligner

    idx, fm, opt_, code, rng = small
    opt = MemOptions()  # default options for the product-level check
    reads = []
    for i in range(6):
        pos = int(rng.integers(0, len(code) - 130))
        codes = code[pos: pos + 100].copy()
        codes[int(rng.integers(0, 100))] = (codes[50] + 1) % 4
        seq = "".join("ACGT"[c] for c in codes)
        reads.append(Read(f"r{i}", seq, "I" * 100, None))
    base = Aligner(idx, MemOptions()).align_batch(reads)
    fmi_aln = Aligner(idx, MemOptions(),
                      seeding_engine=FmiHostEngine(idx, MemOptions(), fm=fm))
    got = fmi_aln.align_batch(reads)
    assert got == base
