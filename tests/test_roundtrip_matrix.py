"""Byte-exact write round-trips across the whole format matrix
(VERDICT r2 item 8): parse -> write -> identical bytes, and
write -> parse -> equal data, for every text format with a writer
(mirrors the reference's golden fixture bank semantics,
/root/reference/tests/buffers.py:16-140).

Canonical-form notes (both match the reference writers):
- Bed12 block lists are written without the optional trailing comma
  (reference io/strops.py:242-273, keep_last=False default).
- bedgraph/wig float values render via repr (5 -> "5.0").
"""
import numpy as np
import pytest

import bionumpy_tpu.io as bio
from bionumpy_tpu.io.delimited_buffers import (BdgBuffer, Bed6Buffer,
                                               Bed12Buffer, BedBuffer,
                                               ChromosomeSizeBuffer,
                                               GfaSequenceBuffer, GFFBuffer,
                                               GTFBuffer, NarrowPeakBuffer)
from bionumpy_tpu.io.multiline_buffer import MultiLineFastaBuffer
from bionumpy_tpu.io.pairs import PairsBuffer
from bionumpy_tpu.io.sam import SAMBuffer
from bionumpy_tpu.io.vcf_buffers import VCFBuffer
from bionumpy_tpu.io.wig import WigBuffer
from bionumpy_tpu.util.testing import assert_bnpdataclass_equal


class _Mfa6(MultiLineFastaBuffer):
    n_characters_per_line = 6


MATRIX = {
    "fastq": (bio.FastQBuffer,
              "@headerishere\nCTTGTTGA\n+\n!!!!!!!!\n"
              "@anotherheader\nCGG\n+\n~~~\n"),
    "fasta": (bio.TwoLineFastaBuffer,
              ">header\nCTTGTTGA\n>header2\nCGG\n"),
    "multiline_fasta": (_Mfa6,
                        ">header\nCTTGCC\nGCCTCC\n"
                        ">header2\nCCCCCC\nGGGCCC\nTTT\n"),
    "bed3": (BedBuffer, "chr1\t1\t3\nchr2\t40\t60\n"),
    "bed6": (Bed6Buffer,
             "chr1\t1\t3\t.\t0\t-\nchr1\t40\t60\t.\t1\t+\n"
             "chr20\t400\t600\t.\t2\t+\n"),
    "bed12": (Bed12Buffer,
              "chr21\t10079666\t10120808\tuc002yiv.1\t0\t-\t10081686\t"
              "10120608\t0\t4\t528,91,101,215\t0,1930,39750,40927\n"),
    "vcf": (VCFBuffer,
            "chr1\t88362\trs4970378\tA\tG\t.\t.\t.\n"
            "chr1\t887560\trs3748595\tA\tCAA\t.\t.\t.\n"
            "chr2\t8878\trs3828047\tAGG\tC\t.\t.\t.\n"),
    "narrowpeak": (NarrowPeakBuffer,
                   "chr1\t10\t100\tpeak1\t30\t.\t5.3\t2.1\t1.5\t20\n"),
    "bedgraph": (BdgBuffer,
                 "chr1\t0\t9800\t5.0\nchr1\t9800\t9871\t3.25\n"),
    "chrom_sizes": (ChromosomeSizeBuffer,
                    "chr1\t248956422\nchr2\t242193529\n"),
    "gfa_sequence": (GfaSequenceBuffer, "S\tid1\tAACCTTGG\nS\tid4\tACTG\n"),
    "wig": (WigBuffer,
            "chr1\t0\t9800\t0.5\nchr1\t9800\t9871\t0.36612\n"
            "chr1\t9871\t9872\t0.17042\n"),
    "sam": (SAMBuffer,
            "SRR1524970.144283\t16\ttest_ref\t1706\t255\t25M\t*\t0\t0\t"
            "TGCTGATGAAGCAGAACAACTTTAA\t]YG[^baaaa^W`ab]]````aaba\tAS:i:0\n"),
    "pairs": (PairsBuffer, "r1\tchr1\t100\tchr2\t200\t+\t-\n"),
    "gtf": (GTFBuffer,
            'I\tsgd\tgene\t335\t649\t.\t+\t.\tgene_id "YAL069W"; '
            'gene_name "YAL069W";\n'),
    "gff": (GFFBuffer,
            "I\tae\tsubst\t100\t200\t.\t+\t.\tID=gene1;Name=n1\n"),
}


def _parse(buffer_type, text):
    tail = ">" if issubclass(buffer_type, MultiLineFastaBuffer) else ""
    raw = np.frombuffer((text + tail).encode(), dtype=np.uint8)
    return buffer_type.from_raw_buffer(raw).get_data()


@pytest.mark.parametrize("fmt", sorted(MATRIX))
def test_parse_write_byte_identity(fmt):
    buffer_type, text = MATRIX[fmt]
    data = _parse(buffer_type, text)
    written = bytes(buffer_type.from_data(data).raw()).decode()
    assert written == text


@pytest.mark.parametrize("fmt", sorted(MATRIX))
def test_write_parse_data_identity(fmt):
    buffer_type, text = MATRIX[fmt]
    data = _parse(buffer_type, text)
    if hasattr(data, "get_data_object"):
        data = data.get_data_object()
    rewritten = bytes(buffer_type.from_data(data).raw())
    reparsed = _parse(buffer_type, rewritten.decode())
    if hasattr(reparsed, "get_data_object"):
        reparsed = reparsed.get_data_object()
    assert_bnpdataclass_equal(reparsed, data)
