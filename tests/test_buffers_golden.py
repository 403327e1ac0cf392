"""Golden-format parity bank: the same literal format snippets the
reference asserts byte-exact round trips on (reference:
/root/reference/tests/buffers.py)."""
import numpy as np
import pytest

import bionumpy_tpu.io as bio
from bionumpy_tpu.io.delimited_buffers import (Bed6Buffer, Bed12Buffer,
                                               GfaSequenceBuffer)
from bionumpy_tpu.io.multiline_buffer import MultiLineFastaBuffer
from bionumpy_tpu.io.sam import SAMBuffer
from bionumpy_tpu.io.vcf_buffers import VCFBuffer, VCFMatrixBuffer
from bionumpy_tpu.io.wig import WigBuffer

FASTQ = ("@headerishere\nCTTGTTGA\n+\n!!!!!!!!\n"
         "@anotherheader\nCGG\n+\n~~~\n")
FASTA = ">header\nCTTGTTGA\n>header2\nCGG\n"
MULTILINE_FASTA = (">header\nCTTGCC\nGCCTCC\n"
                   ">header2\nCCCCCC\nGGGCCC\nTTT\n")
BED6 = ("chr1\t1\t3\t.\t0\t-\n"
        "chr1\t40\t60\t.\t1\t+\n"
        "chr20\t400\t600\t.\t2\t+\n")
VCF = ("chr1\t88362\trs4970378\tA\tG\t.\t.\t.\n"
       "chr1\t887560\trs3748595\tA\tC\t.\t.\t.\n"
       "chr2\t8878\trs3828047\tA\tG\t.\t.\t.\n")
VCF2 = ("chr1\t88362\trs4970378\tA\tG\t.\t.\t.\n"
        "chr1\t887560\trs3748595\tA\tCAA\t.\t.\t.\n"
        "chr2\t8878\trs3828047\tAGG\tC\t.\t.\t.\n")
VCF_MATRIX = (
    "chr1\t883625\trs4970378\tA\tG\t.\t.\t.\t.\t1|1:0,4:4:6:70,6,0\t"
    "1|1:0,19:19:36:358,36,0\t1|1:0,3:3:6:67,6,0\t1|1:0,1:1:3:34,3,0\n"
    "chr1\t887560\trs3748595\tA\tC\t.\t.\t.\t.\t0/0:7,0:7:15:0,15,163\t"
    "1/1:0,30:30:81:888,81,0\t1/1:0,2:2:6:68,6,0\t1/1:0,1:1:3:36,3,0\n"
    "chr1\t887801\trs3828047\tA\tG\t.\t.\t.\t.\t./.\t"
    "1/1:0,17:17:39:398,39,0\t1/1:0,3:3:9:102,9,0\t1/1:0,1:1:3:34,3,0\n")
GFA = "S\tid1\tAACCTTGG\nS\tid4\tACTG\n"
WIG = ("#bedGraph section chr1:0-9871\n"
       "chr1\t0\t9800\t-0\n"
       "chr1\t9800\t9871\t0.36612\n"
       "#bedGraph section chr1:9871-9872\n"
       "chr1\t9871\t9872\t0.17042\n")


def _parse(buffer_type, text):
    raw = np.frombuffer(text.encode(), dtype=np.uint8)
    return buffer_type.from_raw_buffer(raw).get_data()


def test_fastq_golden():
    data = _parse(bio.FastQBuffer, FASTQ)
    assert data.name.tolist() == ["headerishere", "anotherheader"]
    assert data.sequence.tolist() == ["CTTGTTGA", "CGG"]
    assert data.quality.tolist() == [[0] * 8, [93] * 3]
    out = bio.FastQBuffer.from_data(data)
    assert bytes(out.raw()).decode() == FASTQ


def test_fasta_golden():
    data = _parse(bio.TwoLineFastaBuffer, FASTA)
    assert data.name.tolist() == ["header", "header2"]
    assert data.sequence.tolist() == ["CTTGTTGA", "CGG"]
    out = bio.TwoLineFastaBuffer.from_data(data)
    assert bytes(out.raw()).decode() == FASTA


def test_multiline_fasta_golden():
    raw = np.frombuffer((MULTILINE_FASTA + ">").encode(), dtype=np.uint8)
    data = MultiLineFastaBuffer.from_raw_buffer(raw).get_data()
    assert data.name.tolist() == ["header", "header2"]
    assert data.sequence.tolist() == ["CTTGCCGCCTCC", "CCCCCCGGGCCCTTT"]


def test_bed6_golden():
    data = _parse(Bed6Buffer, BED6)
    assert data.chromosome.tolist() == ["chr1", "chr1", "chr20"]
    np.testing.assert_array_equal(data.start, [1, 40, 400])
    np.testing.assert_array_equal(data.stop, [3, 60, 600])
    np.testing.assert_array_equal(data.score, [0, 1, 2])
    assert bytes(Bed6Buffer.from_data(data).raw()).decode() == BED6


def test_vcf_golden():
    data = _parse(VCFBuffer, VCF)
    # positions are 0-based in memory (file is 1-based)
    np.testing.assert_array_equal(data.position, [88361, 887559, 8877])
    assert data.ref_seq.tolist() == ["A", "A", "A"]
    assert data.alt_seq.tolist() == ["G", "C", "G"]
    assert bytes(VCFBuffer.from_data(data).raw()).decode() == VCF


def test_vcf_indel_golden():
    data = _parse(VCFBuffer, VCF2)
    assert data.ref_seq.tolist() == ["A", "A", "AGG"]
    assert data.alt_seq.tolist() == ["G", "CAA", "C"]
    is_snp = np.asarray(data.is_snp())
    np.testing.assert_array_equal(is_snp, [True, False, False])
    assert bytes(VCFBuffer.from_data(data).raw()).decode() == VCF2


def test_vcf_matrix_golden():
    data = _parse(VCFMatrixBuffer, VCF_MATRIX)
    genotypes = data.genotypes
    # encoded 0|0..1|1 codes decode back to the genotype strings
    first = genotypes.encoding.to_string(np.asarray(genotypes.raw())[0])
    assert first.split("\t")[0] == "1|1"
    second = genotypes.encoding.to_string(np.asarray(genotypes.raw())[1])
    assert second.split("\t")[0] == "0/0"
    third = genotypes.encoding.to_string(np.asarray(genotypes.raw())[2])
    assert third.split("\t")[0] == "./."


def test_gfa_golden():
    data = _parse(GfaSequenceBuffer, GFA)
    assert data.name.tolist() == ["id1", "id4"]
    assert data.sequence.tolist() == ["AACCTTGG", "ACTG"]


def test_wig_golden():
    data = _parse(WigBuffer, WIG)
    np.testing.assert_array_equal(data.start, [0, 9800, 9871])
    np.testing.assert_array_equal(data.stop, [9800, 9871, 9872])
    np.testing.assert_allclose(data.value, [-0.0, 0.36612, 0.17042])


def test_bed12_golden():
    text = ("chr21\t10079666\t10120808\tuc002yiv.1\t0\t-\t10081686\t"
            "10120608\t0\t4\t528,91,101,215,\t0,1930,39750,40927,\n")
    data = _parse(Bed12Buffer, text)
    assert data.block_sizes.tolist() == [[528, 91, 101, 215]]
    assert data.block_starts.tolist() == [[0, 1930, 39750, 40927]]
    np.testing.assert_array_equal(data.block_count, [4])
