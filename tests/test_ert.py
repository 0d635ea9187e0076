"""ERT (k-mer-root) backend tests: root-table correctness and full
differential parity with the host oracle and the learned device engine."""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq
from bwameme_tpu.index.build import build_index
from bwameme_tpu.index.ert import build_kmer_table, pick_ert_bits
from bwameme_tpu.seeding.engine import DeviceSeedingEngine
from bwameme_tpu.seeding.host_engine import HostSeedingEngine
from bwameme_tpu.utils.config import MemOptions


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(21)
    n = 5000
    code = rng.integers(0, 4, n).astype(np.uint8)
    code[700:800] = code[2700:2800]
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=10)
    opt = MemOptions()
    opt.min_seed_len = 12
    opt.max_mem_intv = 20
    return idx, opt, code, rng


def test_kmer_table_boundaries(small):
    idx, opt, code, rng = small
    bits = 6
    table = build_kmer_table(idx.key_hi, bits)
    shift = 32 - 2 * bits
    ids = (idx.key_hi >> np.uint32(shift)).astype(np.int64)
    # table[m] must be the first index with id >= m
    for m in rng.integers(0, 1 << (2 * bits), 50):
        m = int(m)
        assert table[m] == np.searchsorted(ids, m)
    assert table[-1] == idx.n_sa
    assert 2 <= pick_ert_bits(idx.n_sa) <= 15


def test_ert_engine_matches_host_oracle(small):
    idx, opt, code, rng = small
    host = HostSeedingEngine(idx, opt)
    ert = DeviceSeedingEngine(idx, opt, lanes=256, root="kmer", ert_bits=7)
    n = len(code)
    reads = []
    for t in range(16):
        pos = int(rng.integers(0, n - 130))
        read = code[pos: pos + 100].copy()
        for _ in range(3):
            read[rng.integers(0, 100)] = rng.integers(0, 4)
        if t % 5 == 0:
            read[rng.integers(0, 100)] = 4
        reads.append(read)
    hs = [host.sorted_smems(r) for r in reads]
    ds = ert.sorted_smems_batch(reads)
    for a, b in zip(hs, ds):
        assert [(s.start, s.end, s.sa_lo, s.hitcount) for s in a] == \
               [(s.start, s.end, s.sa_lo, s.hitcount) for s in b]


def test_ert_equals_learned_device(small):
    idx, opt, code, rng = small
    learned = DeviceSeedingEngine(idx, opt, lanes=256)
    ert = DeviceSeedingEngine(idx, opt, lanes=256, root="kmer", ert_bits=5)
    reads = [code[i * 300: i * 300 + 90].copy() for i in range(8)]
    ls = learned.sorted_smems_batch(reads)
    es = ert.sorted_smems_batch(reads)
    for a, b in zip(ls, es):
        assert [(s.start, s.end, s.sa_lo, s.hitcount) for s in a] == \
               [(s.start, s.end, s.sa_lo, s.hitcount) for s in b]


def test_pipeline_with_ert_backend(small):
    from bwameme_tpu.io.fastq import Read
    from bwameme_tpu.pipeline import Aligner

    idx, opt_, code, rng = small
    reads = []
    for i in range(5):
        pos = int(rng.integers(0, len(code) - 130))
        codes = code[pos: pos + 100].copy()
        codes[int(rng.integers(0, 100))] = (codes[50] + 1) % 4
        seq = "".join("ACGT"[c] for c in codes)
        reads.append(Read(f"r{i}", seq, "I" * 100, None))
    base = Aligner(idx, MemOptions()).align_batch(reads)
    ert_aln = Aligner(
        idx, MemOptions(),
        seeding_engine=DeviceSeedingEngine(idx, MemOptions(), lanes=256,
                                           root="kmer"))
    assert ert_aln.align_batch(reads) == base
