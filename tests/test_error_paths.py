"""Error-path behavior: FormatException line numbers across chunk
boundaries (reference: tests/test_io_exceptions.py semantics)."""
import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.io.exceptions import FormatException
from bionumpy_tpu.ragged.hashtable import HashTable


def test_fastq_error_line_number_across_chunks(tmp_path):
    good_entry = "@r{i}\nACGT\n+\nIIII\n"
    entries = [good_entry.format(i=i) for i in range(100)]
    entries[60] = "Xbad\nACGT\n+\nIIII\n"  # broken header on line 240
    path = tmp_path / "broken.fq"
    path.write_text("".join(entries))
    reader = bnp.open(str(path))
    with pytest.raises(FormatException) as err:
        for chunk in reader.read_chunks(min_chunk_size=500):
            _ = chunk.sequence
    assert err.value.line_number == 240


def test_bed_bad_int_line_number(tmp_path):
    path = tmp_path / "bad.bed"
    path.write_text("chr1\t1\t10\nchr1\t2x\t20\nchr1\t3\t30\n")
    with pytest.raises(FormatException) as err:
        bnp.open(str(path)).read().start
    assert err.value.line_number == 1


def test_vcf_empty_file(example_data):
    data = bnp.open(str(example_data / "empty_variants.vcf")).read()
    assert len(data) == 0


def test_broken_fasta_parses_leniently(example_data):
    # entry with empty sequence + '>' inside data: split into entries
    # instead of crashing (reference fixture example_data/broken_data)
    data = bnp.open(str(example_data / "broken_data" / "broken.fa")).read()
    assert len(data) == 5
    names = data.name.tolist()
    assert names[0] == "read1" and "read3" in names


def test_hashtable():
    table = HashTable(np.array([10, 3, 7]), np.array([100, 30, 70]))
    np.testing.assert_array_equal(table[np.array([7, 10, 3])],
                                  [70, 100, 30])
    np.testing.assert_array_equal(table.contains(np.array([3, 4])),
                                  [True, False])
    with pytest.raises(IndexError):
        table[np.array([4])]


def test_native_kernels_match_fallback():
    from bionumpy_tpu import native
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 4096).astype(np.uint8)
    packed_py = (codes[0::4] | (codes[1::4] << 2) | (codes[2::4] << 4)
                 | (codes[3::4] << 6))
    np.testing.assert_array_equal(native.pack_2bit(codes), packed_py)
    # synthetic BAM block chain
    blocks = [12, 40, 7, 100]
    chunk = bytearray()
    for b in blocks:
        chunk += int(b).to_bytes(4, "little") + bytes(b)
    chunk = np.frombuffer(bytes(chunk), dtype=np.uint8)
    starts = native.bam_find_starts(chunk)
    expected = np.cumsum([0] + [4 + b for b in blocks])
    np.testing.assert_array_equal(starts, expected)
    np.testing.assert_array_equal(native._bam_find_starts_py(chunk),
                                  expected)
    assert native.has_native()
