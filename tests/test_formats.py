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


def test_bwt_2bit_64_roundtrip(idx, tmp_path):
    from bwameme_tpu.index.fmindex import (build_fm_index, read_bwt_2bit_64,
                                           write_bwt_2bit_64)

    prefix = str(tmp_path / "x")
    fm = build_fm_index(idx.bns.code)
    write_bwt_2bit_64(fm, prefix)
    fm2 = read_bwt_2bit_64(prefix)
    assert fm2.n == fm.n
    assert fm2.sentinel_index == fm.sentinel_index
    assert np.array_equal(fm2.count, fm.count)
    assert np.array_equal(fm2.bwt, fm.bwt)
    assert np.array_equal(fm2.cp_count, fm.cp_count)
    assert np.array_equal(fm2.cp_bits, fm.cp_bits)
    assert np.array_equal(fm2.sa, fm.sa)  # full SA from the 1/8 samples


def test_bwt_2bit_64_byte_compat_with_reference(idx, tmp_path, ref_bin):
    """Our writer's file is byte-identical to the reference binary's
    (FMI_search::build_fm_index) over the same FASTA."""
    import subprocess
    from bwameme_tpu.index.fmindex import build_fm_index, write_bwt_2bit_64

    fa = tmp_path / "r.fa"
    chars = np.frombuffer(b"ACGT", np.uint8)
    seq = chars[idx.bns.code].tobytes().decode()
    fa.write_text(">c\n" + "\n".join(
        seq[i: i + 70] for i in range(0, len(seq), 70)) + "\n")
    subprocess.run([ref_bin, "index", "-a", "mem2", str(fa)], check=True,
                   capture_output=True)
    fm = build_fm_index(idx.bns.code)
    prefix = str(tmp_path / "ours")
    write_bwt_2bit_64(fm, prefix)
    theirs = (fa.parent / (fa.name + ".bwt.2bit.64")).read_bytes()
    ours = (tmp_path / "ours.bwt.2bit.64").read_bytes()
    assert ours == theirs


def test_rmi_parameters_roundtrip(idx, tmp_path):
    from bwameme_tpu.models.prmi import (read_rmi_parameters,
                                         write_rmi_parameters)

    prefix = str(tmp_path / "ref.fa")
    write_rmi_parameters(idx, prefix)
    p = read_rmi_parameters(prefix)
    assert p["bits"] == idx.rmi_bits
    assert len(p["alpha"]) == 1 << idx.rmi_bits
    assert len(p["l1_alpha"]) == 0
    # emitted windows contain the true lower bound for every training key
    # under the REFERENCE's arithmetic (f64 over the raw key)
    keys_f = (idx.key_hi.astype(np.float64) * 4294967296.0
              + idx.key_lo.astype(np.float64))
    leaf = (idx.key_hi >> np.uint32(32 - p["bits"])).astype(np.int64)
    pred = np.clip(p["alpha"][leaf] + p["beta"][leaf] * keys_f,
                   0.0, float(idx.n_sa - 1)).astype(np.int64)
    err_lo = (p["err"][leaf] >> np.uint64(32)).astype(np.int64) & 0x3FFFFFFF
    err_hi = (p["err"][leaf] & np.uint64(0x7FFFFFFF)).astype(np.int64)
    i = np.arange(idx.n_sa, dtype=np.int64)
    assert np.all(pred - err_lo <= i)
    assert np.all(i <= pred + err_hi)


def test_import_uses_trained_model(idx, tmp_path):
    """import_reference_index installs the _PARAMETERS model (no retrain)
    and its windows stay valid under our device arithmetic."""
    from bwameme_tpu.index import bntseq as bnsmod
    from bwameme_tpu.models.prmi import predict_np

    prefix = str(tmp_path / "ref.fa")
    bnsmod.dump(idx.bns, prefix)
    formats.export_reference_formats(idx, prefix)
    idx2 = formats.import_reference_index(prefix)
    assert idx2.rmi_bits == idx.rmi_bits
    # same root models (affine change of origin, then f32)
    assert np.allclose(idx2.rmi_beta, idx.rmi_beta, rtol=1e-6, atol=1e-6)
    lo, hi = predict_np(idx2, idx2.key_hi, idx2.key_lo)
    i = np.arange(idx2.n_sa, dtype=np.int64)
    assert np.all((lo <= i) & (i < hi))
