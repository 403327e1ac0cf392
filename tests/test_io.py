import gzip

import numpy as np
import pytest

import bionumpy_tpu.io as bio
from bionumpy_tpu.datatypes import Interval, SequenceEntry
from bionumpy_tpu.io import (FastQBuffer, MultiLineFastaBuffer,
                             TwoLineFastaBuffer, bnp_open, count_entries)
from bionumpy_tpu.io.exceptions import FormatException

FASTQ_TEXT = (
    "@read1\nACGT\n+\nIIII\n"
    "@read2\nGGTTA\n+\n!!!!!\n")

FASTA_TEXT = ">one\nACGT\n>two\nGGTT\n"

BED_TEXT = "chr1\t10\t20\nchr1\t30\t40\nchr2\t5\t9\n"


def _buffer_from_text(buffer_type, text):
    raw = np.frombuffer(text.encode(), dtype=np.uint8)
    return buffer_type.from_raw_buffer(raw)


def test_fastq_parse_golden():
    buf = _buffer_from_text(FastQBuffer, FASTQ_TEXT)
    data = buf.get_data()
    assert data.name.tolist() == ["read1", "read2"]
    assert data.sequence.tolist() == ["ACGT", "GGTTA"]
    assert data.quality.tolist() == [[40] * 4, [0] * 5]


def test_fastq_roundtrip():
    buf = _buffer_from_text(FastQBuffer, FASTQ_TEXT)
    out = FastQBuffer.from_data(buf.get_data())
    assert bytes(out.raw()).decode() == FASTQ_TEXT


def test_fastq_validation_error():
    bad = FASTQ_TEXT.replace("@read2", "Xread2")
    with pytest.raises(FormatException) as err:
        _buffer_from_text(FastQBuffer, bad)
    assert err.value.line_number == 4


def test_fastq_plus_line_error():
    bad = FASTQ_TEXT.replace("+\nIIII", "x\nIIII")
    with pytest.raises(FormatException) as err:
        _buffer_from_text(FastQBuffer, bad)
    assert err.value.line_number == 2


def test_two_line_fasta():
    buf = _buffer_from_text(TwoLineFastaBuffer, FASTA_TEXT)
    data = buf.get_data()
    assert data.name.tolist() == ["one", "two"]
    assert data.sequence.tolist() == ["ACGT", "GGTT"]
    out = TwoLineFastaBuffer.from_data(data)
    assert bytes(out.raw()).decode() == FASTA_TEXT


def test_multiline_fasta():
    text = ">one\nACGT\nGG\n>two\nTTTT\n"
    buf = _buffer_from_text(MultiLineFastaBuffer, text + ">")
    data = buf.get_data()
    assert data.name.tolist() == ["one", "two"]
    assert data.sequence.tolist() == ["ACGTGG", "TTTT"]


def test_bed_parse():
    buf = _buffer_from_text(bio.BedBuffer, BED_TEXT)
    data = buf.get_data()
    assert data.chromosome.tolist() == ["chr1", "chr1", "chr2"]
    np.testing.assert_array_equal(data.start, [10, 30, 5])
    np.testing.assert_array_equal(data.stop, [20, 40, 9])
    out = bio.BedBuffer.from_data(data)
    assert bytes(out.raw()).decode() == BED_TEXT


def test_bed_bad_int():
    with pytest.raises(FormatException):
        _buffer_from_text(bio.BedBuffer,
                          "chr1\t10\t20\nchr1\t3x\t40\n").get_data()


def test_read_fastq_file(example_data):
    data = bnp_open(str(example_data / "big.fq.gz")).read()
    assert len(data) == 1000
    assert data.sequence[0].to_string().startswith("CGGTAGCCAGCTGCGTTCAG")


def test_read_chunks_cover_file(example_data):
    total = 0
    for chunk in bnp_open(str(example_data / "big.fq.gz")).read_chunks(
            min_chunk_size=100_000):
        total += len(chunk)
    assert total == 1000


def test_count_entries(example_data):
    assert count_entries(str(example_data / "big.fq.gz")) == 1000
    assert count_entries(str(example_data / "small_interval.bed")) == 50


def test_vcf_position_shift(example_data):
    data = bnp_open(str(example_data / "variants.vcf")).read()
    # file is 1-based; memory representation is 0-based
    assert int(np.asarray(data.position)[0]) == 883624
    assert data.ref_seq.tolist()[:3] == ["A", "A", "A"]


def test_vcf_info_parsing(example_data):
    data = bnp_open(str(example_data / "info_flag.vcf")).read()
    info = data.info
    hotspot = info.HOTSPOT  # Flag -> bool presence array
    assert hotspot.dtype == bool and len(hotspot) == len(data)
    tier = info.TIER
    assert len(tier) == len(data)


def test_vcf_genotypes(example_data):
    data = bnp_open(str(example_data / "variants.vcf"),
                    buffer_type=bio.VCFMatrixBuffer).read()
    genotypes = data.genotypes
    assert genotypes.shape[0] == len(data)


def test_sam_bam_agree(example_data):
    sam = bnp_open(str(example_data / "alignments.sam")).read()
    bam = bnp_open(str(example_data / "alignments.bam")).read()
    assert len(sam) == len(bam)
    np.testing.assert_array_equal(np.asarray(sam.position) - 1,
                                  np.asarray(bam.position))
    assert sam.sequence.tolist() == bam.sequence.tolist()


def test_gtf_entries(example_data):
    data = bnp_open(str(example_data / "small.gtf")).read()
    genes = data.get_genes()
    assert len(genes) == len(
        [x for x in data.feature_type.tolist() if x == "gene"])


def test_indexed_fasta(example_data):
    ref = bio.open_indexed(str(example_data / "small_genome.fa"))
    assert ref.get_contig_lengths() == {"0": 300, "1": 600, "2": 900,
                                        "3": 1200}
    assert ref["1"].to_string()[:20] == "gcttggtatgaaaacccatc"
    intervals = Interval.from_entry_tuples([("1", 10, 20), ("2", 20, 30)])
    assert ref.get_interval_sequences(intervals).tolist() == \
        ["aaaacccatc", "ggccgttttt"]


def test_write_read_roundtrip(tmp_path, example_data):
    data = bnp_open(str(example_data / "big.fq.gz")).read()
    out_path = tmp_path / "out.fq"
    with bnp_open(str(out_path), "w") as w:
        w.write(data)
    reread = bnp_open(str(out_path)).read()
    assert reread.sequence.tolist() == data.sequence.tolist()
    assert reread.name.tolist() == data.name.tolist()


def test_lazy_field_access(example_data):
    data = bnp_open(str(example_data / "big.fq.gz")).read()
    # lazy: only sequence parsed
    seqs = data.sequence
    assert len(seqs) == 1000
    filtered = data[np.asarray(seqs.lengths) > 200]
    assert len(filtered) == int(np.sum(np.asarray(seqs.lengths) > 200))


def test_custom_delimited_buffer(tmp_path):
    from bionumpy_tpu.bnpdataclass import bnpdataclass
    from bionumpy_tpu.io.delimited_buffers import \
        get_bufferclass_for_datatype

    @bnpdataclass
    class MyRow:
        name: str
        score: int
        value: float

    buffer_class = get_bufferclass_for_datatype(MyRow, delimiter=",",
                                                has_header=True)
    path = tmp_path / "table.csv"
    path.write_text("name,score,value\na,1,0.5\nb,-2,1.5e3\n")
    data = bnp_open(str(path), buffer_type=buffer_class).read()
    assert data.name.tolist() == ["a", "b"]
    np.testing.assert_array_equal(data.score, [1, -2])
    np.testing.assert_allclose(data.value, [0.5, 1500.0])
