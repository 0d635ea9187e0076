"""Round-trips through the reference's on-disk index formats."""

import numpy as np
import pytest

from bwameme_tpu.index import bntseq, formats
from bwameme_tpu.index.build import build_index


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    rng = np.random.default_rng(8)
    n = 5000
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)],
                        ambs=[], code=code)
    return build_index(bns, rmi_bits=8)


def test_0123_roundtrip(idx, tmp_path):
    prefix = str(tmp_path / "x")
    formats.write_0123(idx, prefix)
    t = formats.read_0123(prefix)
    assert len(t) == 2 * idx.l_pac
    assert np.array_equal(t, idx.text[: 2 * idx.l_pac])


def test_pos_packed_roundtrip(idx, tmp_path):
    prefix = str(tmp_path / "x")
    formats.write_pos_packed(idx, prefix)
    sa = formats.read_pos_packed(prefix)
    assert np.array_equal(sa, idx.sa)


def test_suffixarray_roundtrip(idx, tmp_path):
    prefix = str(tmp_path / "x")
    formats.write_suffixarray_uint64(idx, prefix)
    keys = formats.read_suffixarray_uint64(prefix)
    expect = (idx.key_hi.astype(np.uint64) << np.uint64(32)) | idx.key_lo.astype(np.uint64)
    assert np.array_equal(keys, expect)


def test_import_reference_index(idx, tmp_path):
    from bwameme_tpu.index import bntseq as bnsmod

    prefix = str(tmp_path / "ref.fa")
    bnsmod.dump(idx.bns, prefix)
    formats.export_reference_formats(idx, prefix)
    idx2 = formats.import_reference_index(prefix)
    assert np.array_equal(idx2.sa, idx.sa)
    assert np.array_equal(idx2.key_hi, idx.key_hi)
    assert np.array_equal(idx2.isa, idx.isa)
    assert np.array_equal(idx2.text, idx.text)
