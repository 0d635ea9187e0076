"""Native C++ host kernels vs the Python reference contracts."""

import numpy as np
import pytest

from bwameme_tpu.align import native
from bwameme_tpu.align.sw_scalar import sw_extend, sw_global
from bwameme_tpu.utils.config import MemOptions

OPT = MemOptions()

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++")


@pytest.fixture(scope="module")
def toy_index():
    from bwameme_tpu.index import bntseq
    from bwameme_tpu.index.build import build_index

    rng = np.random.default_rng(99)
    n = 30000
    code = rng.integers(0, 4, n).astype(np.uint8)
    # two contigs so intv2rid boundary rejection is exercised
    bns = bntseq.BntSeq(
        l_pac=n,
        contigs=[bntseq.Contig("c1", "", 0, 11000, 0),
                 bntseq.Contig("c2", "", 11000, n - 11000, 0)],
        ambs=[], code=code,
    )
    return build_index(bns, rmi_bits=10)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sw_global_native_matches(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        t = rng.integers(0, 4, int(rng.integers(20, 200))).astype(np.uint8)
        q = t.copy()
        # mutations + a small indel
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(q)))
            q[p] = (q[p] + rng.integers(1, 4)) % 4
        if rng.random() < 0.5 and len(q) > 20:
            cut = int(rng.integers(5, len(q) - 5))
            ln = int(rng.integers(1, 4))
            q = np.concatenate([q[:cut], q[cut + ln:]])
        w = int(rng.choice([10, 50, 100]))
        ref_score, ref_cig = sw_global(q, t, OPT.mat, OPT.o_del, OPT.e_del,
                                       OPT.o_ins, OPT.e_ins, w)
        got = native.sw_global_native(q, t, OPT.mat, OPT.o_del, OPT.e_del,
                                      OPT.o_ins, OPT.e_ins, w)
        assert got is not None
        assert got[0] == ref_score
        assert got[1] == ref_cig


@pytest.mark.parametrize("seed", [0, 1])
def test_chain_and_filter_native_matches(seed, toy_index):
    """Batched native chaining == per-read Python chain_seeds+filter_chains
    (the compare_result.sh differential pattern at the chaining stage)."""
    from bwameme_tpu.align import chain as chain_mod
    from bwameme_tpu.seeding.host_engine import HostSeedingEngine

    idx = toy_index
    eng = HostSeedingEngine(idx, OPT)
    rng = np.random.default_rng(seed)
    queries, smems_per = [], []
    for i in range(120):
        a = int(rng.integers(0, idx.l_pac - 160))
        read = idx.text[a: a + 151].copy()
        for _ in range(rng.poisson(1.5)):
            p = int(rng.integers(0, 151))
            read[p] = (read[p] + rng.integers(1, 4)) % 4
        if i % 3 == 0:
            read = (3 - read[::-1]) % 4
        if i % 17 == 0:
            read[50:55] = 4  # N run
        if i % 41 == 0:
            read = read[:25]  # near-min-length read
        queries.append(read.astype(np.uint8))
        smems_per.append(eng.sorted_smems(read))

    ref = [
        chain_mod.filter_chains(
            OPT, chain_mod.chain_seeds(OPT, idx.bns, len(q), s, idx.sa))
        for q, s in zip(queries, smems_per)
    ]
    got = chain_mod.chain_and_filter_batch(OPT, idx.bns, queries, smems_per,
                                           idx.sa)

    def sig(chains):
        return [
            (c.pos, c.rid, c.is_alt, c.w, c.kept, round(c.frac_rep, 9),
             [(s.rbeg, s.qbeg, s.len, s.score) for s in c.seeds])
            for c in chains
        ]

    for a, b in zip(ref, got):
        assert sig(a) == sig(b)


@pytest.mark.parametrize("seed", [0, 1])
def test_sw_extend_native_matches(seed):
    rng = np.random.default_rng(seed + 10)
    for _ in range(25):
        q = rng.integers(0, 4, int(rng.integers(10, 120))).astype(np.uint8)
        t = rng.integers(0, 4, int(rng.integers(10, 150))).astype(np.uint8)
        if rng.random() < 0.6:
            n = min(len(q), len(t))
            t[:n] = q[:n]  # make them extend
        h0 = int(rng.integers(1, 60))
        w = int(rng.choice([5, 20, 100]))
        ref = sw_extend(q, t, OPT.mat, OPT.o_del, OPT.e_del, OPT.o_ins,
                        OPT.e_ins, w, 5, OPT.zdrop, h0)
        out = native.sw_extend_native(q, t, OPT.mat, OPT.o_del, OPT.e_del,
                                      OPT.o_ins, OPT.e_ins, w, 5, OPT.zdrop, h0)
        assert out is not None
        assert (
            [ref.score, ref.qle, ref.tle, ref.gtle, ref.gscore, ref.max_off]
            == out.tolist()
        )


def test_flat_native_extension_matches(toy_index):
    """The fully-native fast path (C++ chaining -> C++ reg/job build ->
    device dispatch -> C++ fold+seedcov+purge) == the dataclass fused path,
    every alnreg field, on mutated/indel/RC/N/short reads."""
    import jax.numpy as jnp

    from bwameme_tpu.align import chain as chain_mod
    from bwameme_tpu.align import extend as extend_mod
    from bwameme_tpu.seeding.host_engine import HostSeedingEngine

    idx = toy_index
    eng = HostSeedingEngine(idx, OPT)
    rng = np.random.default_rng(5)
    queries, smems_per = [], []
    for i in range(80):
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
        if i % 37 == 0:
            read = read[:40]
        queries.append(read.astype(np.uint8))
        smems_per.append(eng.sorted_smems(read))

    t32 = jnp.asarray(idx.text32)
    assert extend_mod.rescore_is_noop(OPT, queries)
    chains = chain_mod.chain_and_filter_batch(OPT, idx.bns, queries,
                                              smems_per, idx.sa)
    ref = extend_mod.extend_chains_batch_fused(OPT, idx.bns, idx.text,
                                               queries, chains, t32)
    raw = chain_mod.chain_and_filter_raw(OPT, idx.bns, queries, smems_per,
                                         idx.sa)
    tok = extend_mod.extend_flat_submit(OPT, idx.bns, queries, raw, t32)
    got = extend_mod.extend_flat_finish(tok)

    def sig(regs):
        return [(r.rb, r.re, r.qb, r.qe, r.rid, r.score, r.truesc, r.w,
                 r.seedcov, r.seedlen0, round(r.frac_rep, 9), r.is_alt)
                for r in regs]

    for a, b in zip(ref, got):
        assert sig(a) == sig(b)


def test_build_mode4_rows_matches_numpy():
    from bwameme_tpu.align import native

    if not native.available():
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(3)
    n = 5000
    sa = rng.permutation(n).astype(np.int64)
    isa = np.empty(n, np.int64)
    isa[sa] = np.arange(n)
    key_hi = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    key_lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    rkm_n = native.build_mode4_rows_native(sa, key_hi, key_lo, isa)
    assert rkm_n is not None
    kh_t = key_hi[isa]
    rkm = np.empty((n, 4), np.uint32)
    rkm[:, 0] = sa.astype(np.uint32)
    rkm[:, 1] = key_hi
    rkm[:, 2] = key_lo
    nxt = sa + 32
    rkm[:, 3] = np.where(nxt < n, kh_t[np.minimum(nxt, n - 1)],
                         np.uint32(0xFFFFFFFF))
    assert np.array_equal(rkm_n, rkm)
