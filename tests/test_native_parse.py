"""Fused native FASTQ parse+pack kernel (csrc/host_kernels.cpp
fastq_parse_pack) vs the layered host parser and the numpy twin.

The kernel replaces the reference's separate newline-scan / field-gather
/ encode passes (reference: bionumpy/io/one_line_buffer.py:36-71,
bionumpy/io/fastq_buffer.py:14-61) with one multithreaded pass
producing the 2-bit-packed device transport directly."""
import gzip

import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu import native

BIG_FQ = "/root/reference/example_data/big.fq.gz"


@pytest.fixture(scope="module")
def raw():
    return np.frombuffer(gzip.open(BIG_FQ, "rb").read(), np.uint8)


def test_matches_layered_parser(raw):
    out, lengths, n_bases = native.fastq_parse_pack(raw)
    data = bnp.open(BIG_FQ).read()
    seqs = bnp.change_encoding(data.sequence, bnp.DNAEncoding)
    assert np.array_equal(np.asarray(seqs.lengths), lengths)
    flat = np.asarray(seqs.ravel().raw())
    assert n_bases == len(flat)
    assert np.array_equal(out, native.pack_2bit_fill(flat, len(out)))


def test_native_matches_numpy_twin(raw):
    out, lengths, n_bases = native.fastq_parse_pack(raw)
    out_py, lengths_py, n_bases_py = native._fastq_parse_pack_py(
        raw, len(out))
    assert n_bases == n_bases_py
    assert np.array_equal(lengths, lengths_py)
    assert np.array_equal(out, out_py)


def test_thread_counts_agree(raw):
    big = np.tile(raw, 7)
    ref = None
    for nt in (1, 2, 3, 8):
        out, lengths, n_bases = native.fastq_parse_pack(big, n_threads=nt)
        if ref is None:
            ref = (out, lengths, n_bases)
        else:
            assert n_bases == ref[2]
            assert np.array_equal(lengths, ref[1])
            assert np.array_equal(out, ref[0])


def _fastq_bytes(entries):
    text = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                   for i, s in enumerate(entries))
    return np.frombuffer(text.encode(), np.uint8)


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_small_and_unaligned_lengths(impl):
    # lengths chosen so entry boundaries land mid-byte in the 2-bit pack
    entries = ["ACGT", "A", "GGC", "TTTTTTT", "ACGTACGTACGTA", "CG"]
    raw = _fastq_bytes(entries)
    if impl == "native":
        out, lengths, n_bases = native.fastq_parse_pack(raw)
    else:
        out, lengths, n_bases = native._fastq_parse_pack_py(
            raw, len(raw) // 4 + 16)
    flat = np.concatenate([
        bnp.as_encoded_array(s, bnp.DNAEncoding).raw() for s in entries])
    assert np.array_equal(lengths, [len(s) for s in entries])
    assert n_bases == len(flat)
    assert np.array_equal(out, native.pack_2bit_fill(flat, len(out)))


@pytest.mark.parametrize("impl", [native.fastq_parse_pack,
                                  native._fastq_parse_pack_py])
def test_error_paths(impl):
    def run(raw):
        if impl is native._fastq_parse_pack_py:
            return impl(raw, len(raw) // 4 + 16)
        return impl(raw)

    good = _fastq_bytes(["ACGT", "GGCC"])
    run(good.copy())  # sanity
    bad = good.copy()
    bad[0] = ord("x")  # header
    with pytest.raises(ValueError, match="malformed"):
        run(bad)
    bad = good.copy()
    bad[np.flatnonzero(good == ord("+"))[0]] = ord("x")
    with pytest.raises(ValueError, match="malformed"):
        run(bad)
    bad = good.copy()
    bad[6] = ord("N")  # inside sequence
    with pytest.raises(ValueError, match="malformed"):
        run(bad)
    with pytest.raises(ValueError, match="malformed"):
        run(good[:-3])  # truncated entry


def test_lowercase_accepted():
    raw = _fastq_bytes(["acgt"])
    out, lengths, n_bases = native.fastq_parse_pack(raw)
    assert n_bases == 4
    assert out[0] == 0 | (1 << 2) | (2 << 4) | (3 << 6)


def test_empty_chunk():
    out, lengths, n_bases = native.fastq_parse_pack(
        np.empty(0, np.uint8), out_bytes=16)
    assert n_bases == 0 and len(lengths) == 0
    assert np.array_equal(out, np.zeros(16, np.uint8))


def test_gather_rows_matches_numpy_plan():
    from bionumpy_tpu import native
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, 40000).astype(np.uint8)
    starts = rng.integers(0, 39000, 5000).astype(np.int64)
    lens = rng.integers(0, 30, 5000).astype(np.int64)
    out = native.gather_rows(src, starts, lens)
    if out is None:
        return  # no native lib in this environment
    exp = src[np.repeat(starts - np.insert(np.cumsum(lens)[:-1], 0, 0),
                        lens) + np.arange(int(lens.sum()))] \
        if lens.sum() else np.empty(0, np.uint8)
    assert np.array_equal(out, exp)
    # tail row ending at the buffer end, short-row fast-path width
    assert np.array_equal(
        native.gather_rows(src, np.array([len(src) - 3]),
                           np.array([3])), src[-3:])
    # out-of-bounds row falls back (returns None)
    assert native.gather_rows(src, np.array([len(src) - 1]),
                              np.array([2])) is None


def test_parse_ints_signed_and_fallback():
    from bionumpy_tpu import native
    rng = np.random.default_rng(0)
    vals = rng.integers(-10**17, 10**17, 2000)
    text = "\n".join(str(v) for v in vals).encode()
    buf = np.frombuffer(text, np.uint8)
    starts, ends, pos = [], [], 0
    for v in vals:
        t = str(v)
        starts.append(pos)
        ends.append(pos + len(t))
        pos += len(t) + 1
    out = native.parse_ints(buf, np.array(starts), np.array(ends))
    if out is None:
        return
    assert np.array_equal(out, vals)
    bad = np.frombuffer(b"12a", np.uint8)
    assert native.parse_ints(bad, np.array([0]), np.array([3])) is None
    empty = native.parse_ints(bad, np.array([1]), np.array([1]))
    assert empty is None  # empty row -> checked numpy path


def test_array_stream_protocol():
    from bionumpy_tpu.io.pgzip import ArrayStream
    arr = np.frombuffer(b"hello\nworld\nrest", np.uint8)
    s = ArrayStream(arr.copy())
    assert s.readline() == b"hello\n"
    assert s.read(3) == b"wor"
    assert s.readline() == b"ld\n"
    assert bytes(memoryview(s.read_array())) == b"rest"
    assert s.read() == b""
    s.seek(0)
    assert s.read() == b"hello\nworld\nrest"
    s.seek(-4, 2)
    assert s.read() == b"rest"
