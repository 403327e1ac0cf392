"""Device-resident data model: chained device ops pay exactly ONE H2D
upload of the sequence data (VERDICT r1 item 2; north star
"device-resident EncodedRaggedArray equivalents")."""
import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.ops import resident
from bionumpy_tpu.sequence import (count_kmers, get_kmers, get_minimizers,
                                   get_motif_scores)
from bionumpy_tpu.sequence.position_weight_matrix import PWM


@pytest.fixture
def seqs():
    rng = np.random.default_rng(7)
    strings = ["".join("ACGT"[i] for i in rng.integers(0, 4, n))
               for n in rng.integers(40, 90, 50)]
    return bnp.as_encoded_array(strings, bnp.DNAEncoding)


def test_chained_ops_single_upload(seqs):
    resident.reset_transfer_counters()
    counts = count_kmers(seqs, 31)
    mins = get_minimizers(seqs, 21, 31)
    kmers = get_kmers(seqs, 15)
    assert resident.TRANSFER_COUNT == 1, resident.TRANSFER_COUNT
    # and the results are still right (host recompute)
    lengths = np.asarray(seqs.lengths)
    assert int(sum(counts.counts)) == int(np.maximum(lengths - 30, 0).sum())
    assert [len(r) for r in mins] == list(np.maximum(lengths - 30, 0))
    assert [len(r) for r in kmers] == list(np.maximum(lengths - 14, 0))


def test_pwm_shares_upload(seqs):
    pwm = PWM(np.log(np.full((4, 5), 0.25)) - np.log(0.25), "ACGT")
    resident.reset_transfer_counters()
    _ = count_kmers(seqs, 5)
    # force the device PWM path regardless of size threshold
    from bionumpy_tpu.sequence.position_weight_matrix import \
        _device_motif_scores
    scores = _device_motif_scores(seqs, pwm)
    assert resident.TRANSFER_COUNT == 1
    assert np.allclose(scores[: int(seqs.lengths[0]) - 4], 0.0, atol=1e-5)


def test_mutation_invalidates_cache(seqs):
    resident.reset_transfer_counters()
    c1 = count_kmers(seqs, 31)
    seqs[0] = "A" * int(seqs.lengths[0])
    c2 = count_kmers(seqs, 31)
    assert resident.TRANSFER_COUNT == 2
    poly_a = "A" * 31
    assert int(c2[poly_a]) >= int(seqs.lengths[0]) - 30


def test_sparse_counts_match_host_recompute(seqs):
    counts = count_kmers(seqs, 31)
    # independent recompute: python-int polynomial hashes per window
    expected = {}
    for row in seqs:
        codes = np.asarray(row.raw()).astype(np.int64)
        for i in range(len(codes) - 30):
            h = 0
            for j in range(31):
                h |= int(codes[i + j]) << (2 * j)
            expected[h] = expected.get(h, 0) + 1
    got = dict(zip((int(c) for c in counts.label_codes),
                   (int(c) for c in counts.counts)))
    assert got == expected
