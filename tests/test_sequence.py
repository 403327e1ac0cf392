import numpy as np


def test_count_minimizers_with_gc_matches_separate_paths():
    """The fused one-transfer config-3 job equals the separate
    count_minimizers + gc_track results, incl. the cap-overflow loop."""
    import bionumpy_tpu as bnp
    from bionumpy_tpu.sequence import (count_minimizers,
                                       count_minimizers_with_gc)
    rng = np.random.default_rng(3)
    lengths = rng.integers(30, 200, 200)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    seqs = bnp.EncodedRaggedArray(
        bnp.EncodedArray(flat, bnp.DNAEncoding), lengths)
    k, w, bs = 21, 30, 100
    exp = count_minimizers(seqs, k, w, cap=1 << 14)
    gc_exp = np.add.reduceat((flat == 1) | (flat == 2),
                             np.arange(0, len(flat), bs))
    for cap in (1 << 14, 64):  # second one exercises the cap loop
        got, gc = count_minimizers_with_gc(seqs, k, w, cap=cap,
                                           bin_size=bs)
        assert np.array_equal(got.label_codes, exp.label_codes)
        assert np.array_equal(got.counts, exp.counts)
        assert np.array_equal(gc, gc_exp)
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu import DNAEncoding, as_encoded_array
from bionumpy_tpu.sequence import (PWM, count_encoded, count_kmers,
                                   get_kmers, get_minimizers,
                                   get_motif_scores, get_reverse_complement,
                                   match_string, translate_dna_to_protein)
from bionumpy_tpu.sequence.kmers import KmerEncoder


@pytest.fixture
def seqs():
    return as_encoded_array(["ACTG", "AAA", "TTGGC"], DNAEncoding)


def _kmer_strings(kmers):
    return [[kmers.encoding.to_string(h) for h in row.raw()]
            for row in kmers]


def test_get_kmers_golden(seqs):
    kmers = get_kmers(seqs, 3)
    assert _kmer_strings(kmers) == [["ACT", "CTG"], ["AAA"],
                                    ["TTG", "TGG", "GGC"]]


def test_kmer_hash_values_match_reference_convention(seqs):
    kmers = get_kmers(as_encoded_array("ACGT", DNAEncoding), 2)
    # little-endian polynomial: AC = 0 + 1*4 = 4; CG = 1 + 2*4 = 9
    np.testing.assert_array_equal(np.asarray(kmers.raw()), [4, 9, 14])


def test_kmer_roundtrip_random():
    rng = np.random.default_rng(42)
    for k in (1, 2, 15, 16, 17, 31):
        lengths = rng.integers(0, 80, 30)
        flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
        seq = bnp.EncodedRaggedArray(bnp.EncodedArray(flat, DNAEncoding),
                                     lengths)
        kmers = get_kmers(seq, k)
        np.testing.assert_array_equal(kmers.lengths,
                                      np.maximum(lengths - k + 1, 0))
        # verify a sample row against the straightforward polynomial
        encoder = KmerEncoder(k, DNAEncoding)
        for row_idx in np.flatnonzero(lengths >= k)[:3]:
            row = seq[row_idx].raw().astype(np.int64)
            expected = [
                int((row[i: i + k] *
                     4 ** np.arange(k, dtype=np.int64)).sum())
                for i in range(len(row) - k + 1)]
            np.testing.assert_array_equal(
                np.asarray(kmers[row_idx].raw()), expected)


def test_count_kmers_device_path(seqs):
    counts = count_kmers(as_encoded_array(["ACGT", "ACG"], DNAEncoding), 2)
    assert counts["AC"] == 2 and counts["CG"] == 2 and counts["GT"] == 1
    assert counts.counts.sum() == 5


def test_count_kmers_matches_bincount():
    rng = np.random.default_rng(1)
    lengths = rng.integers(0, 60, 50)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    seq = bnp.EncodedRaggedArray(bnp.EncodedArray(flat, DNAEncoding),
                                 lengths)
    for k in (2, 5, 8):
        counts = count_kmers(seq, k)
        hashes = np.asarray(get_kmers(seq, k).ravel().raw())
        np.testing.assert_array_equal(counts.counts,
                                      np.bincount(hashes, minlength=4 ** k))


def test_minimizers_golden(seqs):
    minimizers = get_minimizers(seqs, 2, 4)
    assert _kmer_strings(minimizers) == [["AC"], [], ["GG", "GC"]]


def test_minimizers_match_host():
    rng = np.random.default_rng(7)
    lengths = rng.integers(0, 100, 40)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    seq = bnp.EncodedRaggedArray(bnp.EncodedArray(flat, DNAEncoding),
                                 lengths)
    for k, w in ((3, 5), (21, 30)):
        device = get_minimizers(seq, k, w)
        kmer_hashes = get_kmers(seq, k)
        for row_idx in range(min(len(seq), 5)):
            hashes = np.asarray(kmer_hashes[row_idx].raw())
            n_windows = max(0, lengths[row_idx] - w + 1)
            expected = [hashes[i: i + (w - k + 1)].min()
                        for i in range(n_windows)]
            np.testing.assert_array_equal(
                np.asarray(device[row_idx].raw()), expected)


def test_pwm_scores_golden():
    pwm = PWM.from_dict({"A": [5, 1], "C": [1, 5], "G": [0, 0],
                         "T": [0, 0]})
    scores = get_motif_scores(as_encoded_array(["ACTGAC", "CA", "GG"]), pwm)
    np.testing.assert_allclose(
        scores[0], [5.991464547107982, -np.inf, -np.inf, -np.inf,
                    5.991464547107982])
    assert np.isneginf(scores[2][0])


def test_pwm_device_matches_host():
    rng = np.random.default_rng(5)
    lengths = rng.integers(10, 200, 300)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    seq = bnp.EncodedRaggedArray(bnp.EncodedArray(flat, DNAEncoding),
                                 lengths)
    matrix = rng.normal(size=(4, 11))
    pwm = PWM(matrix, "ACGT")
    scores = get_motif_scores(seq, pwm)  # large => device path
    host = pwm.calculate_scores(seq.ravel())
    from bionumpy_tpu.ragged import RaggedArray, RaggedShape
    host_ragged = RaggedArray(host, RaggedShape(lengths))[:, :-10]
    np.testing.assert_allclose(np.asarray(scores.ravel()),
                               np.asarray(host_ragged.ravel()), rtol=1e-5)


def test_reverse_complement():
    rc = get_reverse_complement(as_encoded_array(["ACGT", "GG"],
                                                 DNAEncoding))
    assert rc.tolist() == ["ACGT", "CC"]


def test_translate():
    dna = bnp.datatypes.SequenceEntry.from_entry_tuples([("s", "ACGTAT")])
    assert translate_dna_to_protein(dna).sequence.tolist() == ["TY"]
    long_dna = bnp.datatypes.SequenceEntry.from_entry_tuples(
        [("s", "ATG" * 20000)])
    assert translate_dna_to_protein(long_dna).sequence.tolist() == \
        ["M" * 20000]


def test_match_string():
    matches = match_string(as_encoded_array(["ACGT", "TACTAC"]), "AC")
    assert matches.tolist() == [[True, False, False],
                                [False, True, False, False, True]]


def test_count_encoded_rows():
    seqs = as_encoded_array(["AAC", "GG", ""], DNAEncoding)
    counts = count_encoded(seqs, axis=-1)
    np.testing.assert_array_equal(
        counts.counts, [[2, 1, 0, 0], [0, 0, 2, 0], [0, 0, 0, 0]])
    flat_counts = count_encoded(seqs, axis=None)
    np.testing.assert_array_equal(flat_counts.counts, [2, 1, 2, 0])


def test_big_fastq_kmers(example_data):
    data = bnp.open(str(example_data / "big.fq.gz")).read()
    seqs = bnp.change_encoding(data.sequence, DNAEncoding)
    kmers = get_kmers(seqs, 31)
    first = [kmers.encoding.to_string(h) for h in kmers[0].raw()[:3]]
    assert first == ["CGGTAGCCAGCTGCGTTCAGTATGGAAGATT",
                     "GGTAGCCAGCTGCGTTCAGTATGGAAGATTT",
                     "GTAGCCAGCTGCGTTCAGTATGGAAGATTTG"]
    assert np.asarray(kmers.lengths).sum() == \
        np.maximum(np.asarray(seqs.lengths) - 30, 0).sum()


def test_kmer_index():
    from bionumpy_tpu.sequence.indexing import KmerLookup
    seqs = as_encoded_array(["ACGT", "GGGG", "ACGG"], DNAEncoding)
    lookup = KmerLookup.create_lookup(seqs, k=2)
    found = lookup.get_sequences("AC")
    assert found.tolist() == ["ACGT", "ACGG"]


def test_transcript_sequences(example_data):
    import bionumpy_tpu.io as bio
    gtf = bio.bnp_open(str(example_data / "small.gtf")).read()
    ref_seq = "A" * 40000
    entries = bnp.sequence.get_transcript_sequences(gtf, ref_seq)
    assert len(entries) == len(gtf.get_exons().transcript_id.tolist()) or \
        len(entries) > 0


class TestSparseKmerCounts:
    """count_kmers for label spaces too large to enumerate (k>12 DNA /
    k>8 generic) — counts only observed k-mers; the reference cannot
    count these at all (bincount over 4**k)."""

    def test_31mer_parity_with_python(self):
        from collections import Counter
        seq_strs = ["ACGTACGTACGTACGTACGTACGTACGTACGTACGT",
                    "TTTTGGGGCCCCAAAATTTTGGGGCCCCAAAATTTT",
                    "ACGT"]  # too short for any 31-mer
        seqs = bnp.as_encoded_array(seq_strs, bnp.DNAEncoding)
        counts = bnp.count_kmers(seqs, 31)
        truth = Counter(s[i:i + 31]
                        for s in seq_strs for i in range(len(s) - 30))
        assert dict(zip(counts.alphabet, counts.counts)) == dict(truth)
        assert int(counts["ACGTACGTACGTACGTACGTACGTACGTACG"]) == 2
        assert int(counts["A" * 31]) == 0

    def test_fold_matches_whole(self):
        seq_strs = ["ACGTACGTACGTACGTACGTACGTACGTACGTACGT",
                    "TTTTGGGGCCCCAAAATTTTGGGGCCCCAAAATTTT"]
        whole = bnp.count_kmers(
            bnp.as_encoded_array(seq_strs, bnp.DNAEncoding), 31)
        folded = sum(
            bnp.count_kmers(bnp.as_encoded_array([s], bnp.DNAEncoding), 31)
            for s in seq_strs)
        assert folded == whole

    def test_most_common(self):
        seqs = bnp.as_encoded_array(["ACGTACGTACGTACG" * 3],
                                    bnp.DNAEncoding)
        top = bnp.count_kmers(seqs, 15).most_common(1)
        assert top.counts[0] == max(
            bnp.count_kmers(seqs, 15).counts)

    def test_generic_alphabet_k9(self):
        from collections import Counter
        s = "MFLSPR" * 4
        counts = bnp.count_kmers(
            bnp.as_encoded_array([s], bnp.AminoAcidEncoding), 9)
        truth = Counter(s[i:i + 9] for i in range(len(s) - 8))
        assert dict(zip(counts.alphabet, counts.counts)) == dict(truth)

    def test_real_file_31mers(self, example_data):
        data = bnp.open(str(example_data / "reads.fq")).read()
        seqs = bnp.change_encoding(data.sequence, bnp.DNAEncoding)
        counts = bnp.count_kmers(seqs, 31)
        n_expected = int(np.maximum(
            np.asarray(seqs.lengths) - 30, 0).sum())
        assert int(counts.counts.sum()) == n_expected
