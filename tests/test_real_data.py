"""Real-file integration tests over the reference's example_data corpus.

Mirrors the reference's real-data strategy (reference:
tests/test_real_data.py, tests/test_integration.py): parse every file in
/root/reference/example_data with the default reader, assert golden entry
counts (independently verified with grep -vc '^#' / zcat), and exercise
cross-format consistency and write round-trips.
"""
import gzip
import pathlib

import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.io.exceptions import FormatException
from bionumpy_tpu.io.motifs import read_motif
from bionumpy_tpu.sequence.position_weight_matrix import PWM

# file → entry count; counts verified against `grep -vc '^#'` / `zcat`
GOLDEN_COUNTS = {
    "1000Genomes_chr21-22.vcf.gz": 96711,
    "a.bed": 2,
    "alignments.bam": 2,
    "alignments.bed": 7,
    "alignments.sam": 2,
    "big.fq.gz": 1000,
    "chr21-22.chrom.sizes": 2,
    "ctcf.bed.gz": 44722,
    "ctcf_chr21-22.bam": 61770,
    "ctcf_chr21-22.bed.gz": 1535,
    "dna_translatable.fa": 200,
    "empty_variants.vcf": 0,
    "few_variants.vcf": 113,
    "gc_bedtest_multichr.bed": 4,
    "gc_bedtest_onechr.bed": 2,
    "gc_test_multichr.fa": 2,
    "gc_test_onechr.fa": 1,
    "haplotypes.vcf": 85,
    "hg38.chrom.sizes": 455,
    "hg38_unix_sorted.chrom.sizes": 455,
    "hprc_multiallelic.vcf": 58,
    "info_flag.vcf": 6,
    "interval_with_sequence.bed": 2,
    "lof_file.vcf": 331,
    "many_alignments.bam": 393,
    "many_alignments.sam": 393,
    "multi_line.fa": 2,
    "peaks.narrowPeak": 3,
    "polaris.vcf": 34,
    "polaris_small.vcf": 8,
    "reads.fq": 2,
    "reads.fq.gz": 1000,
    "sacCer3.ensGene.gtf.gz": 34755,
    "sacCer3.fa.gz": 17,
    "sacCer3_sample_variants.vcf.gz": 44251,
    "small.bdg": 99,
    "small.chrom.sizes": 3,
    "small.fa": 3,
    "small.fna": 3,
    "small.gtf": 5,
    "small.pairs": 3,
    "small_alignments.bam": 46,
    "small_alignments.sam": 46,
    "small_genome.fa": 4,
    "small_gff.gff3": 67,
    "small_interval.bed": 50,
    "small_peaks.narrowPeak": 13,
    "small_phased_biallelic.vcf": 5,
    "small_sequence.fa": 3,
    "small_summits.bed": 13,
    "small_treat_pileup.bdg": 3627,
    "syndip.vcf": 410,
    "test.bam": 72,
    "test.bed": 71,
    "test.sam": 72,
    "test2.bed": 5,
    "thousand_genomes.vcf": 74,
    "two_line_genome.fa": 4,
    "variants.vcf": 3,
    "variants_phased.vcf": 3,
    "variants_with_af.vcf": 2397,
    "variants_with_header.vcf": 53,
    "variants_with_single_individual_genotypes_and_info.vcf": 80,
    "variants_without_genotypes.vcf": 18,
    "vcf_symbolic_sequences.vcf": 29,
    "vcf_with_broken_header.vcf": 58,
    "znf263.bed.gz": 19113,
}

SMALL_FILES = [f for f, n in GOLDEN_COUNTS.items() if n <= 5000]
BIG_FILES = [f for f, n in GOLDEN_COUNTS.items() if n > 5000]


@pytest.mark.parametrize("fname", SMALL_FILES)
def test_parse_small_file(example_data, fname):
    data = bnp.open(example_data / fname).read()
    assert len(data) == GOLDEN_COUNTS[fname]


@pytest.mark.parametrize("fname", BIG_FILES)
def test_parse_big_file(example_data, fname):
    n = sum(len(c) for c in bnp.open(example_data / fname).read_chunks())
    assert n == GOLDEN_COUNTS[fname]


@pytest.mark.parametrize("fname", [
    "test.bed", "thousand_genomes.vcf", "small_gff.gff3", "reads.fq",
    "small.fa", "small_alignments.sam", "small.bdg",
])
def test_count_entries_matches_len(example_data, fname):
    assert bnp.count_entries(example_data / fname) == GOLDEN_COUNTS[fname]


def test_bam_sam_consistency(example_data):
    """BAM and SAM views of the same alignments must decode identically
    (reference: bionumpy/io/bam.py vs io/buffers/sam.py)."""
    bam = bnp.open(example_data / "many_alignments.bam").read()
    sam = bnp.open(example_data / "many_alignments.sam").read()
    assert len(bam) == len(sam)
    assert bam.name.tolist() == sam.name.tolist()
    np.testing.assert_array_equal(np.asarray(bam.position),
                                  np.asarray(sam.position) - 1)
    assert bam.sequence.tolist()[:20] == sam.sequence.tolist()[:20]
    assert bam.chromosome.tolist()[:20] == sam.chromosome.tolist()[:20]


def test_bed_gz_matches_plain(example_data, tmp_path):
    """Gzip and plain parsing of the same bytes agree."""
    gz = example_data / "ctcf_chr21-22.bed.gz"
    plain = tmp_path / "ctcf.bed"
    plain.write_bytes(gzip.open(gz).read())
    a = bnp.open(gz).read()
    b = bnp.open(plain).read()
    assert len(a) == len(b)
    np.testing.assert_array_equal(np.asarray(a.start), np.asarray(b.start))
    np.testing.assert_array_equal(np.asarray(a.stop), np.asarray(b.stop))


@pytest.mark.parametrize("fname", [
    "reads.fq", "small.fa", "test.bed", "small.gtf", "peaks.narrowPeak",
    "small.bdg", "variants.vcf", "small.pairs", "small_gff.gff3",
])
def test_write_roundtrip_identical_text(example_data, tmp_path, fname):
    """read → write → read is stable and (for unmodified lazy data) the
    written text is byte-identical to the non-comment input lines
    (reference throughput path: bnpdataclass/lazybnpdataclass.py:196-214)."""
    src = example_data / fname
    data = bnp.open(src).read()
    out = tmp_path / fname
    with bnp.open(out, "w") as f:
        f.write(data)
    again = bnp.open(out).read()
    assert len(again) == len(data)
    for field in data.__dataclass_fields__:
        a, b = getattr(data, field), getattr(again, field)
        if hasattr(a, "tolist"):
            assert a.tolist() == b.tolist(), field


def test_broken_fasta_structure(example_data):
    """broken.fa parses as raw bytes (BaseEncoding validates nothing);
    the malformed ">aACACAA" line becomes its own header with an empty
    sequence, and the file's missing trailing newline is repaired by the
    reader (reference: io/parser.py terminal-newline append)."""
    data = bnp.open(example_data / "broken_data" / "broken.fa").read()
    assert data.name.tolist() == ["read1", "read2", "read3", "aACACAA",
                                  "read4"]
    assert data.sequence.tolist() == ["ACACACAC", "ACATTA", "", "", "aAAA"]


def test_invalid_byte_raises_encoding_error():
    """Invalid bytes surface at AlphabetEncoding time with an
    offset-carrying EncodingError (reference:
    encodings/alphabet_encoding.py:8-100)."""
    from bionumpy_tpu.encodings.exceptions import EncodingError
    with pytest.raises((EncodingError, FormatException)):
        bnp.as_encoded_array("ACGT=ACGT", bnp.DNAEncoding)


def test_jaspar_and_csv_motifs(example_data):
    pwm_j = read_motif(example_data / "MA0080.1.jaspar")
    pwm_c = read_motif(example_data / "pwm.csv")
    assert isinstance(pwm_j, PWM) and isinstance(pwm_c, PWM)
    assert pwm_j.window_size > 0 and pwm_c.window_size > 0


def test_airr_tsv_custom_dataclass(example_data):
    """Dynamic delimited parsing with a header row (reference:
    io/delimited_buffers.py:352-437 get_bufferclass_for_datatype)."""
    from bionumpy_tpu.bnpdataclass import bnpdataclass

    @bnpdataclass
    class AIRREntry:
        sequence: str
        sequence_aa: str
        v_call: str
        j_call: str

    buf = bnp.get_bufferclass_for_datatype(
        AIRREntry, delimiter="\t", has_header=False)
    data = bnp.open(example_data / "airr.tsv", buffer_type=buf).read()
    assert len(data) > 0
    assert all(len(s) > 0 for s in data.sequence.tolist())
    assert data.v_call.tolist()[0].startswith("TRBV")


def test_indexed_fasta_interval_sequences(example_data):
    genome = bnp.open_indexed(example_data / "small_genome.fa")
    names = list(genome.get_contig_lengths())
    assert len(names) == 4
    seq = genome[names[0]]
    assert len(seq) == genome.get_contig_lengths()[names[0]]


def test_vcf_info_real_file(example_data):
    """INFO fields parse into typed dynamic dataclass fields
    (reference: io/vcf_buffers.py:131-153)."""
    data = bnp.open(example_data /
                    "variants_with_single_individual_genotypes_and_info.vcf"
                    ).read()
    info = data.info
    assert np.asarray(info.AN).dtype.kind == "i"
    assert info.SVTYPE.tolist()[0] in ("SNV", "DEL", "INS", "DUP", "")


def test_multiallelic_vcf(example_data):
    data = bnp.open(example_data / "hprc_multiallelic.vcf").read()
    alts = data.alt_seq.tolist()
    assert any("," in a for a in alts)
