"""Differential tests: batched TPU banded-SW kernel vs the scalar contract
(scalarBandedSWA semantics, reference: src/bandedSWA.cpp:116-238)."""

import numpy as np
import pytest

from bwameme_tpu.align.sw_scalar import sw_extend
from bwameme_tpu.ops.banded_sw import extend_pairs_np
from bwameme_tpu.utils.config import MemOptions

OPT = MemOptions()


def rand_pair(rng, qmax=100, tmax=120, mutate=0.08, indel=0.02):
    """Make a realistic extension pair: target is a mutated copy of query."""
    qlen = int(rng.integers(10, qmax))
    q = rng.integers(0, 4, qlen).astype(np.int32)
    t = []
    for c in q:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            t.append(int(rng.integers(0, 4)))  # insertion
        if rng.random() < mutate:
            t.append(int((c + rng.integers(1, 4)) % 4))
        else:
            t.append(int(c))
    t = np.array(t + [int(x) for x in rng.integers(0, 4, int(rng.integers(0, 20)))], dtype=np.int32)
    if len(t) == 0:
        t = rng.integers(0, 4, 5).astype(np.int32)
    h0 = int(rng.integers(1, 60))
    w = int(rng.choice([5, 20, 100]))
    return q, t[:tmax], h0, w


def check_batch(pairs):
    got = extend_pairs_np(
        pairs, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins,
        end_bonus=5, zdrop=OPT.zdrop,
    )
    for (q, t, h0, w), g in zip(pairs, got):
        ref = sw_extend(q, t, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                        OPT.e_ins, w, 5, OPT.zdrop, h0)
        assert g["score"] == ref.score, (g, ref, q.tolist(), t.tolist(), h0, w)
        assert g["qle"] == ref.qle, (g, ref)
        assert g["tle"] == ref.tle, (g, ref)
        assert g["gtle"] == ref.gtle, (g, ref)
        assert g["gscore"] == ref.gscore, (g, ref)
        assert g["max_off"] == ref.max_off, (g, ref)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_realistic_pairs(seed):
    rng = np.random.default_rng(seed)
    pairs = [rand_pair(rng) for _ in range(40)]
    check_batch(pairs)


def test_pure_random_pairs():
    # fully random target: exercises z-drop and early-zero termination
    rng = np.random.default_rng(10)
    pairs = []
    for _ in range(40):
        q = rng.integers(0, 4, int(rng.integers(5, 80))).astype(np.int32)
        t = rng.integers(0, 4, int(rng.integers(5, 100))).astype(np.int32)
        pairs.append((q, t, int(rng.integers(1, 40)), int(rng.choice([3, 10, 100]))))
    check_batch(pairs)


def test_exact_match_pair():
    rng = np.random.default_rng(11)
    q = rng.integers(0, 4, 60).astype(np.int32)
    pairs = [(q, q.copy(), 25, 100)]
    got = extend_pairs_np(pairs, OPT.mat, 6, 1, 6, 1, 5, 100)[0]
    # perfect extension: score = h0 + qlen * a, reaches both ends
    assert got["score"] == 25 + 60
    assert got["qle"] == 60 and got["tle"] == 60
    assert got["gscore"] == 25 + 60


def test_tiny_h0_zero_row():
    # h0 small + mismatching target: row max hits 0 -> early break
    q = np.zeros(30, np.int32)          # AAAA...
    t = np.full(40, 3, np.int32)        # TTTT...
    check_batch([(q, t, 1, 100), (q, t, 5, 100)])


def test_narrow_band():
    rng = np.random.default_rng(12)
    q = rng.integers(0, 4, 70).astype(np.int32)
    t = np.concatenate([q[:30], q[25:]]).astype(np.int32)  # 5bp duplication
    check_batch([(q, t, 19, 2), (q, t, 19, 1), (q, t, 19, 0)])


def test_fused_extension_matches_buffer_path():
    """extend_chains_batch_fused (one coordinate-based dispatch, on-device
    band retries) == extend_chains_batch (per-round buffer dispatches) on
    mutated/indel/RC/N reads — every alnreg field."""
    import jax.numpy as jnp

    from bwameme_tpu.align import chain as chain_mod
    from bwameme_tpu.align import extend as extend_mod
    from bwameme_tpu.index import bntseq
    from bwameme_tpu.index.build import build_index
    from bwameme_tpu.seeding.host_engine import HostSeedingEngine

    rng = np.random.default_rng(77)
    n = 20000
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("cF", "", 0, n, 0)], ambs=[],
        code=code)
    idx = build_index(bns, rmi_bits=10)
    eng = HostSeedingEngine(idx, OPT)

    queries, smems_per = [], []
    for i in range(60):
        a = int(rng.integers(0, idx.l_pac - 160))
        read = idx.text[a: a + 151].copy()
        for _ in range(rng.poisson(2.0)):
            p = int(rng.integers(0, 151))
            read[p] = (read[p] + rng.integers(1, 4)) % 4
        if rng.random() < 0.3:
            cut = int(rng.integers(10, 140))
            ln = int(rng.integers(1, 6))
            read = np.concatenate([read[:cut], read[cut + ln:]])
        if i % 3 == 0:
            read = (3 - read[::-1]) % 4
        if i % 13 == 0:
            read[30:33] = 4
        queries.append(read.astype(np.uint8))
        smems_per.append(eng.sorted_smems(read))

    ch_a = chain_mod.chain_and_filter_batch(OPT, idx.bns, queries, smems_per,
                                            idx.sa)
    ch_b = chain_mod.chain_and_filter_batch(OPT, idx.bns, queries, smems_per,
                                            idx.sa)
    regs_a = extend_mod.extend_chains_batch(OPT, idx.bns, idx.text, queries,
                                            ch_a)
    regs_b = extend_mod.extend_chains_batch_fused(
        OPT, idx.bns, idx.text, queries, ch_b, jnp.asarray(idx.text32))

    def sig(regs):
        return [(r.rb, r.re, r.qb, r.qe, r.rid, r.score, r.truesc, r.w,
                 r.seedcov, r.seedlen0) for r in regs]

    for a, b in zip(regs_a, regs_b):
        assert sig(a) == sig(b)


def test_band_retry_differential():
    """The MAX_BAND_TRY=2 band-doubling retry must fire and agree across the
    buffer, fused, and flat-native extension paths (narrow band + deletions
    straddling the retry threshold (w>>1)+(w>>2))."""
    import jax.numpy as jnp

    from bwameme_tpu.align import chain as chain_mod
    from bwameme_tpu.align import extend as extend_mod
    from bwameme_tpu.index import bntseq
    from bwameme_tpu.index.build import build_index
    from bwameme_tpu.seeding.host_engine import HostSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    rng = np.random.default_rng(4)
    n = 30000
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[],
        code=code)
    idx = build_index(bns, rmi_bits=10)
    opt = MemOptions(w=20)
    eng = HostSeedingEngine(idx, opt)

    reads = []
    for i, d in enumerate([18, 22, 26, 35, 17, 19]):
        a = 3000 + i * 1200
        reads.append(np.concatenate(
            [idx.text[a: a + 100],
             idx.text[a + 100 + d: a + 100 + d + 33]]).astype(np.uint8))
    smems_per = [eng.sorted_smems(r) for r in reads]
    chains = chain_mod.chain_and_filter_batch(opt, idx.bns, reads, smems_per,
                                              idx.sa)
    regs_b = extend_mod.extend_chains_batch(opt, idx.bns, idx.text, reads,
                                            chains)
    assert any(r.w > opt.w for regs in regs_b for r in regs), \
        "fixture no longer triggers the band retry"
    ch2 = chain_mod.chain_and_filter_batch(opt, idx.bns, reads, smems_per,
                                           idx.sa)
    regs_f = extend_mod.extend_chains_batch_fused(
        opt, idx.bns, idx.text, reads, ch2, jnp.asarray(idx.text32))
    raw = chain_mod.chain_and_filter_raw(opt, idx.bns, reads, smems_per,
                                         idx.sa)
    tok = extend_mod.extend_flat_submit(opt, idx.bns, reads, raw,
                                        jnp.asarray(idx.text32))
    regs_n = extend_mod.extend_flat_finish(tok)

    def sig(regs):
        return [(r.rb, r.re, r.qb, r.qe, r.score, r.truesc, r.w, r.seedcov)
                for r in regs]

    for a, b in zip(regs_b, regs_f):
        assert sig(a) == sig(b)
    for a, b in zip(regs_b, regs_n):
        assert sig(a) == sig(b)
