"""FASTQ source handling: files, gzip, and kopen-style URLs.

The reference's kopen (src/kopen.cpp) accepts plain files, pipes, http and
ftp URLs; bwameme_tpu.io.fastq._open covers file/stdin/gzip plus
http(s)/ftp/file URL streams. file:// URLs exercise the exact urllib branch
the network schemes use, with no egress needed.
"""

import gzip

import numpy as np
import pytest

from bwameme_tpu.io.fastq import read_chunks

FQ = "@r0 c1\nACGTACGT\n+\nIIIIIIII\n@r1\nTTTTGGGG\n+\nFFFFFFFF\n"


def _check(reads):
    assert [r.name for r in reads] == ["r0", "r1"]
    assert reads[0].seq == "ACGTACGT"
    assert reads[0].comment == "c1"
    assert reads[1].qual == "FFFFFFFF"


def test_plain_and_gzip(tmp_path):
    p = tmp_path / "r.fq"
    p.write_text(FQ)
    _check([r for chunk in read_chunks(str(p), chunk_bp=10**9)
            for r in chunk])
    pz = tmp_path / "r.fq.gz"
    pz.write_bytes(gzip.compress(FQ.encode()))
    _check([r for chunk in read_chunks(str(pz), chunk_bp=10**9)
            for r in chunk])


def test_url_source(tmp_path):
    p = tmp_path / "u.fq"
    p.write_text(FQ)
    url = "file://" + str(p)
    _check([r for chunk in read_chunks(url, chunk_bp=10**9) for r in chunk])


def test_url_source_gz(tmp_path):
    pz = tmp_path / "u.fq.gz"
    pz.write_bytes(gzip.compress(FQ.encode()))
    url = "file://" + str(pz)
    _check([r for chunk in read_chunks(url, chunk_bp=10**9) for r in chunk])
