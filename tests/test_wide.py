"""Wide (int64) device coordinates — the human-genome-scale layout.

The reference's whole point is the human genome: text+RC = 6.2e9 suffixes
(reference: src/fastmap.cpp:477-617, README.md:151-156), which exceeds the
int32 ranks/positions of the fast single-chip layout. Wide mode stores the
sa plane int64, leaf windows in int64 params64 records, and runs every rank
computation in int64 (ops/sa_search.py).

Two test layers:
* differential parity on a small index — wide engine output must be
  bit-identical to the int32 engine and the host oracle, single-device and
  on a sharded mesh (modes 1/2/3);
* an ANALYTIC jumbo index (env-gated, BWAMEME_JUMBO=1): a periodic text
  with >2^31 suffixes whose suffix array and query answers have closed
  forms, so genuinely-33-bit ranks are exercised and verified without an
  11-hour SA build. The generator itself is validated against brute-force
  suffix sorting at small n.
"""

import os

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.seeding.engine import DeviceSeedingEngine
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils.config import MemOptions


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(123)
    n = 24000
    code = rng.integers(0, 4, n).astype(np.uint8)
    code[8000:8600] = np.tile(code[8000:8075], 8)  # repeats
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=10)
    opt = MemOptions()
    reads = []
    for i in range(10):
        st = int(rng.integers(0, idx.l_pac - 150))
        c = idx.text[st: st + 110].copy()
        for _ in range(int(rng.integers(0, 3))):
            pp = int(rng.integers(0, 110))
            c[pp] = (c[pp] + rng.integers(1, 4)) % 4
        if i % 3 == 0:
            c = (3 - c[::-1]).astype(np.uint8)
        reads.append(c)
    return idx, opt, reads


def _smems(eng, reads):
    return [[(s.start, s.end, s.sa_lo, s.hitcount) for s in sm]
            for sm in eng.sorted_smems_batch(reads)]


@pytest.mark.parametrize("mode", [
    1, 2,
    pytest.param(3, marks=pytest.mark.slow),
    pytest.param(4, marks=pytest.mark.slow),
])
def test_wide_matches_int32_single_device(small, mode):
    idx, opt, reads = small
    base = DeviceSeedingEngine(idx, opt, mode=mode)
    wide = DeviceSeedingEngine(idx, opt, mode=mode, wide=True)
    assert wide.di.wide
    if mode == 4:
        # mode 4 carries positions inside the 5-word rank rows
        assert wide.di.sa is None and wide.di.rk.shape[1] == 5
    else:
        assert wide.di.sa.dtype == np.int64
    assert _smems(base, reads) == _smems(wide, reads)


@pytest.mark.parametrize("mode", [3, 4])
@pytest.mark.slow
def test_wide_matches_host_oracle_on_mesh(small, mode):
    import jax
    from jax.sharding import Mesh

    idx, opt, reads = small
    host = HostSeedingEngine(idx, opt)
    mesh = Mesh(np.array(jax.devices()[:4]), ("idx",))
    wide = DeviceSeedingEngine(idx, opt, mode=mode, wide=True, mesh=mesh,
                               lanes=256)
    got = _smems(wide, reads)
    want = [[(s.start, s.end, s.sa_lo, s.hitcount) for s in
             host.sorted_smems(c)] for c in reads]
    assert got == want


@pytest.mark.slow
def test_wide_fused_steps(small):
    """The fused step-2/3 dispatches (off by default in tests) under wide
    int64 slot planes."""
    idx, opt, reads = small
    base = DeviceSeedingEngine(idx, opt, mode=3)
    wide = DeviceSeedingEngine(idx, opt, mode=3, wide=True)
    for eng in (base, wide):
        eng.fuse_step2 = True
        eng.fuse_step3 = True
    assert _smems(base, reads) == _smems(wide, reads)


# --------------------------------------------------------------- analytic
def periodic_index(n, p, m, seed=0):
    """Host-index-like object over text = block(p) repeated n/p times
    (block chars in {0,1,2}, all p rotations distinct within m chars), with
    the CLOSED-FORM suffix array:

    * suffixes with >= m chars before the all-T pad sort by
      (rotation rank, position ascending) — any two distinct rotations
      differ within m chars, and within a phase the longer suffix is
      smaller (the pad char T=3 exceeds every block char);
    * the m-1 "short" suffixes are placed by direct comparison.

    Returns (idx_like, rot_order, rot_windows, counts) where rot_order[k]
    is the phase of the k-th smallest rotation and rot_windows[k] its
    m-char window.
    """
    assert n % p == 0
    q = n // p
    rng = np.random.default_rng(seed)
    while True:
        block = rng.integers(0, 3, p).astype(np.uint8)
        wins = np.stack([np.roll(block, -i)[:m] for i in range(p)])
        if len(np.unique(wins, axis=0)) == p:
            break
    # rotation order by m-window (unique -> total order)
    rot_order = np.lexsort(wins.T[::-1])
    # long suffixes: pos <= n - m, per phase count
    phases = rot_order.astype(np.int64)
    long_cnt = (n - m - phases) // p + 1
    # phase-major long-suffix SA (float-free, no sort at scale)
    blocks = [phases[k] + p * np.arange(long_cnt[k], dtype=np.int64)
              for k in range(p)]
    sa_long = np.concatenate(blocks)
    # short suffixes (j = n - pos < m chars), placed by direct comparison
    text = np.tile(block, q)
    shorts = np.arange(n - m + 1, n, dtype=np.int64)  # lengths m-1 .. 1

    def suffix_key(pos, L=2 * m):
        s = np.full(L, 3, np.uint8)
        t = text[pos: pos + L]
        s[: len(t)] = t
        return tuple(s)

    sa = sa_long
    for pos in sorted(shorts, key=suffix_key):
        k = suffix_key(pos)
        lo, hi = 0, len(sa)
        while lo < hi:  # binary search by direct suffix comparison
            mid = (lo + hi) // 2
            if suffix_key(sa[mid]) < k:
                lo = mid + 1
            else:
                hi = mid
        sa = np.insert(sa, lo, pos)

    from bwameme_tpu.index.packing import pack_words

    pad = (-(n + 64)) % 16 + 64
    text32 = pack_words(np.concatenate([text, np.full(pad, 3, np.uint8)]),
                        pad_code=3)
    # 4-leaf P-RMI stub: leaf = first base, flat model, window = leaf width
    counts = np.bincount(text, minlength=4).astype(np.int64)
    leaf_start = np.zeros(5, np.int64)
    np.cumsum(counts, out=leaf_start[1:])
    width = int(counts.max())

    class Idx:
        pass

    idx = Idx()
    idx.n_sa = n
    idx.sa = sa
    idx.isa = None
    idx.text32 = text32
    idx.rmi_bits = 2
    idx.rmi_leaf_start = leaf_start
    idx.rmi_alpha = np.zeros(4, np.float32)
    idx.rmi_beta = np.zeros(4, np.float32)
    idx.rmi_err_lo = np.full(4, width, np.int64)
    idx.rmi_err_hi = np.full(4, width + 1, np.int64)
    return idx, rot_order, wins, text


def expected_hit(idx_obj, rot_order, text, n, p, m, k, L):
    """Closed-form (mlen, lb, cnt) for pattern = the k-th rotation's
    L-char window (L >= m)."""
    phase = int(rot_order[k])
    pat = text[phase: phase + L]
    cnt = (n - L - phase) // p + 1
    phases = rot_order.astype(np.int64)
    long_cnt = (n - m - phases) // p + 1
    base = int(long_cnt[:k].sum())
    # short suffixes sorting strictly before the pattern block
    before = 0
    for pos in range(n - m + 1, n):
        j = n - pos
        t = text[pos:]
        jj = min(j, L)
        d = np.flatnonzero(t[:jj] != pat[:jj])
        if len(d) and t[d[0]] < pat[d[0]]:
            before += 1
    return L, base + before, cnt


def _queries(di, patterns, mesh=None):
    import jax.numpy as jnp

    from bwameme_tpu.index.packing import pack_words
    from bwameme_tpu.ops.sa_search import make_search_fns

    L = max(len(c) for c in patterns)
    W = (L + 15) // 16 + 3
    R = len(patterns)
    qbuf = np.full((R, W), 0xFFFFFFFF, np.uint32)
    for i, c in enumerate(patterns):
        padded = np.concatenate([c, np.full((-len(c)) % 16, 3, np.uint8)])
        qbuf[i, : len(padded) // 16] = pack_words(padded, pad_code=3)
    fns = make_search_fns(di, max_read_words=W - 3, mesh=mesh)
    row = jnp.arange(R, dtype=jnp.int32)
    piv = jnp.zeros(R, jnp.int32)
    v = jnp.asarray([len(c) for c in patterns], jnp.int32)
    mi = jnp.ones(R, jnp.int64 if di.wide else jnp.int32)
    mlen, lb, cnt = fns["sa_query"](di, jnp.asarray(qbuf), row, piv, v, mi)
    return np.asarray(mlen), np.asarray(lb), np.asarray(cnt)


def test_periodic_generator_matches_bruteforce():
    n, p, m = 4096, 64, 16
    idx, rot_order, wins, text = periodic_index(n, p, m, seed=5)
    pad = np.full(64, 3, np.uint8)
    full = np.concatenate([text, pad])
    brute = sorted(range(n), key=lambda i: tuple(full[i: i + n - i + 64]))
    assert list(idx.sa) == brute

    from bwameme_tpu.ops.sa_search import DeviceIndex

    di = DeviceIndex.from_host(idx, mode=1, wide=True)
    ks = [0, 1, p // 2, p - 1]
    pats = [text[int(rot_order[k]): int(rot_order[k]) + 48] for k in ks]
    mlen, lb, cnt = _queries(di, pats)
    for i, k in enumerate(ks):
        want = expected_hit(idx, rot_order, text, n, p, m, k, 48)
        assert (int(mlen[i]), int(lb[i]), int(cnt[i])) == want


@pytest.mark.skipif(not os.environ.get("BWAMEME_JUMBO"),
                    reason="set BWAMEME_JUMBO=1 (needs ~60 GB RAM): "
                    "genuinely >2^31-suffix wide search")
def test_jumbo_over_int31():
    """2^31 + 2^27 suffixes on an 8-shard mesh: ranks past int32 verified
    against closed forms."""
    import jax
    from jax.sharding import Mesh

    from bwameme_tpu.ops.sa_search import DeviceIndex

    p = 4096
    n = ((2**31 + 2**27) // p) * p
    m = 16
    idx, rot_order, wins, text = periodic_index(n, p, m, seed=9)
    assert idx.n_sa > 2**31
    mesh = Mesh(np.array(jax.devices()[:8]), ("idx",))
    di = DeviceIndex.from_host(idx, mode=1, wide=True, mesh=mesh)
    ks = [0, 17, p // 2, p - 3, p - 1]
    pats = [text[int(rot_order[k]): int(rot_order[k]) + 48] for k in ks]
    mlen, lb, cnt = _queries(di, pats, mesh=mesh)
    saw_big = False
    for i, k in enumerate(ks):
        want = expected_hit(idx, rot_order, text, n, p, m, k, 48)
        assert (int(mlen[i]), int(lb[i]), int(cnt[i])) == want
        saw_big |= int(lb[i]) > 2**31
    # the rank spread over 4096 rotations guarantees some lb past int32
    assert saw_big
