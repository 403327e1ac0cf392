"""Regression tests for the round-4 advisor findings (ADVICE.md):
each reproduces the exact reported failure scenario."""
import gzip
import zlib

import numpy as np
import pytest

import bionumpy_tpu as bnp


def test_extract_intervals_clips_to_chromosome_end():
    """An interval whose stop runs past the chromosome end must clip
    (reference python-slice semantics), not read the NEXT chromosome's
    bases, and must not raise on the last chromosome."""
    from bionumpy_tpu.datatypes import Interval
    from bionumpy_tpu.genomic_data import GenomicSequence
    seq = GenomicSequence.from_dict({"chr1": "AAAA", "chr2": "GGGG"})
    out = seq[Interval(["chr1"], [2], [7])]
    assert out.tolist() == ["AA"]
    # last chromosome: previously IndexError
    out2 = seq[Interval(["chr2"], [1], [99])]
    assert out2.tolist() == ["GGG"]


def test_open_gzip_falls_back_on_trailing_padding(tmp_path):
    """A valid single-member gzip with trailing zero padding reads fine
    through gzip.open; open_gzip must fall back, not raise at open."""
    from bionumpy_tpu.io.pgzip import open_gzip
    payload = b"@r1\nACGT\n+\nIIII\n" * 20
    data = gzip.compress(payload) + b"\x00" * 13
    p = tmp_path / "padded.fq.gz"
    p.write_bytes(data)
    with gzip.open(str(p), "rb") as f:  # sanity: stdlib reads it
        assert f.read() == payload
    f = open_gzip(str(p))
    assert f.read() == payload


def test_binned_pileup_rejects_int32_overflow(tmp_path):
    """Rebased spans past 2^31 must raise with a split hint instead of
    wrapping coordinates negative."""
    from bionumpy_tpu.pipeline import binned_pileup_bed
    bed = tmp_path / "a.bed"
    bed.write_text("chrA\t100\t200\n")
    big = {"chrA": 2_500_000_000, "chrB": 2_500_000_000}
    with pytest.raises(ValueError, match="int32"):
        binned_pileup_bed(str(bed), big, bin_size=100)


def test_member_scanner_exhausted_terminates():
    """exhausted must become True once scan_to saw the file end (the
    offset-based guard was dead for files >= 18 bytes)."""
    from bionumpy_tpu.pipeline import _MemberScanner
    payload = b"@r\nAC\n+\nII\n" * 30
    data = gzip.compress(payload)
    sc = _MemberScanner(data, len(data))
    assert not sc.exhausted
    sc.scan_to(len(data))
    assert sc.exhausted
    # a partial scan does not flip it
    sc2 = _MemberScanner(data, len(data))
    sc2.scan_to(len(data) // 2)
    assert not sc2.exhausted
