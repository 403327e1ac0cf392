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


def test_single_member_gzip_splits_to_target_batches(tmp_path):
    """A large SINGLE-member gzip must split into ~target-sized batches
    (r5 self-review finding: the member-batch path cannot split within
    a member and briefly produced ONE whole-file device batch)."""
    from concurrent.futures import ThreadPoolExecutor

    from bionumpy_tpu.pipeline import (_batch_arrays, _parse_batch,
                                       _prefetched)
    payload = gzip.decompress(
        open("/root/reference/example_data/big.fq.gz", "rb").read())
    p = tmp_path / "single.fq.gz"
    buf = gzip.compress(payload * 12, compresslevel=1)
    p.write_bytes(buf)
    pool = ThreadPoolExecutor(2)
    try:
        sizes = [
            _parse_batch(b)[2]
            for b in _prefetched(_batch_arrays(str(p), 400_000, pool))]
    finally:
        pool.shutdown(wait=False)
    assert len(sizes) >= 2
    assert max(sizes) < 1_500_000
    assert sum(sizes) == 12 * 217_598


def test_gather_rows_negative_length_falls_back():
    from bionumpy_tpu import native
    src = np.zeros(64, np.uint8)
    out = native.gather_rows(src, np.array([0, 20], np.int64),
                             np.array([20, -40], np.int64))
    assert out is None  # must NOT overflow an undersized output


def test_cap_overflow_rerun_beats_acc_cap_error():
    """When a batch-cap overflow also drives the accumulator past
    acc_cap, the self-healing rerun must win over the hard error."""
    from bionumpy_tpu.pipeline import count_kmers_fastq
    import bionumpy_tpu as bnp
    c, s = count_kmers_fastq(
        "/root/reference/example_data/big.fq.gz", 31, cap=256)
    data = bnp.open("/root/reference/example_data/big.fq.gz").read()
    exp = bnp.count_kmers(
        bnp.change_encoding(data.sequence, bnp.DNAEncoding), 31)
    assert np.array_equal(np.asarray(c.counts), np.asarray(exp.counts))
    # but a genuinely-too-small explicit acc_cap still raises
    with pytest.raises(ValueError, match="acc_cap"):
        count_kmers_fastq("/root/reference/example_data/big.fq.gz",
                          31, cap=1 << 18, acc_cap=1 << 14)


def test_array_stream_readline_limit():
    from bionumpy_tpu.io.pgzip import ArrayStream
    s = ArrayStream(np.frombuffer(b"abcdef\nxyz", np.uint8))
    assert s.readline(3) == b"abc"
    assert s.readline() == b"def\n"
