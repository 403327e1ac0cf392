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
