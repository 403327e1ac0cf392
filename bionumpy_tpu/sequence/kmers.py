"""K-mer extraction and counting — device-accelerated.

API-compatible with bionumpy/sequence/kmers.py; the alphabet-size-4 fast
path runs the uint32-limb rolling-hash kernel on TPU
(bionumpy_tpu/ops/kmers.py) instead of the reference's
npstructures.BitArray loop (reference: bionumpy/sequence/kmers.py:106-128).
Hash values are bit-exact with the reference's int64 polynomial hashes.
"""
from __future__ import annotations

import logging

import numpy as np

from ..encoded_array import (BaseEncoding, EncodedArray, EncodedRaggedArray,
                             as_encoded_array, change_encoding)
from ..encodings.alphabet_encoding import AlphabetEncoding
from ..encodings.exceptions import EncodingError
from ..encodings.kmer_encodings import KmerEncoding
from ..encodings import DNAEncoding
from ..ragged import RaggedShape, RaggedView
from ..streams import streamable
from ..util import is_subclass_or_instance
from .count_encoded import (EncodedCounts, SparseEncodedCounts,
                            count_encoded)
from .rollable import RollableFunction

logger = logging.getLogger(__name__)


def convolution(func):
    """Decorator applying a flat windowed function over a ragged array and
    trimming the window_size-1 garbage windows at each row end
    (reference: bionumpy/sequence/kmers.py:90-103)."""
    def new_func(_sequence, window_size, *args, **kwargs):
        shape, sequence = _sequence.shape, _sequence.ravel()
        convoluted = func(sequence, window_size, *args, **kwargs)
        if not isinstance(shape[-1], np.ndarray):
            out = convoluted.reshape(shape)
        else:
            from ..ragged import RaggedArray, RaggedShape
            wrapper = EncodedRaggedArray if \
                isinstance(convoluted, EncodedArray) else RaggedArray
            out = wrapper(convoluted, RaggedShape(shape[-1]))
        if window_size == 1:
            return out
        return out[..., : (-window_size + 1)]

    return new_func


class KmerEncoder(RollableFunction):
    """Hash function object for one k-length window
    (reference: bionumpy/sequence/kmers.py:17-33)."""

    def __init__(self, k: int, alphabet_encoding):
        self.window_size = k
        self._k = k
        self._encoding = alphabet_encoding
        self._alphabet_size = alphabet_encoding.alphabet_size
        self._convolution = self._alphabet_size ** np.arange(
            self._k, dtype=np.int64)

    def __call__(self, sequence: EncodedArray) -> EncodedArray:
        sequence = as_encoded_array(sequence, target_encoding=self._encoding)
        return EncodedArray(
            sequence.raw().astype(np.int64).dot(self._convolution),
            KmerEncoding(self._encoding, self._k))

    def inverse(self, kmer_hash) -> EncodedArray:
        return EncodedArray(
            (np.asarray(kmer_hash)[:, np.newaxis] // self._convolution)
            % self._alphabet_size, self._encoding)

    def sample_domain(self, n: int) -> EncodedArray:
        return EncodedArray(
            np.random.randint(0, self._alphabet_size,
                              size=self._k * n).reshape(n, self._k)
            .astype(np.uint8), self._encoding)


def _device_dna_kmers(sequence: EncodedRaggedArray,
                      k: int) -> EncodedRaggedArray:
    """TPU path: device-resident packed words (one H2D per chunk, cached
    on the array — ops/resident.py) -> (lo, hi) limb kernel -> int64
    host combine -> contiguous per-row gather of valid windows."""
    from ..ops.device import bucket_size
    from ..ops.kmers import kmer_pairs_packed
    from ..ops.resident import device_seqs

    ds = device_seqs(sequence)
    lengths = ds.lengths
    pairs = kmer_pairs_packed(ds.words, k)
    n_fetch = min(bucket_size(max(ds.n, 1), 1 << 14), ds.n_positions)
    # one contiguous D2H; little-endian (lo, hi) pairs ARE int64
    flat_pairs = np.ascontiguousarray(
        np.asarray(pairs[:n_fetch].reshape(-1)))
    hashes = flat_pairs.view(np.int64)[:ds.n]
    out_lengths = np.maximum(lengths - k + 1, 0)
    starts = np.insert(np.cumsum(lengths), 0, 0)[:-1]
    view = RaggedView(starts, out_lengths)
    valid_hashes = hashes[view.get_flat_indices()]
    return EncodedRaggedArray(
        EncodedArray(valid_hashes, KmerEncoding(sequence.encoding, k)),
        RaggedShape(out_lengths))


def get_kmers(sequence, k: int) -> EncodedRaggedArray:
    """All k-mer hashes per sequence (reference semantics:
    bionumpy/sequence/kmers.py:36-88).

    Examples
    --------
    >>> import bionumpy_tpu as bnp
    >>> seqs = bnp.as_encoded_array(["ACGT", "AC"], bnp.DNAEncoding)
    >>> bnp.get_kmers(seqs, 2)
    encoded_ragged_array([[AC, CG, GT],
     [AC]], 2merEncoding(AlphabetEncoding('ACGT')))
    """
    assert 0 < k < 32, "k must be in (0, 32)"
    sequence = as_encoded_array(sequence)
    if sequence.encoding == BaseEncoding:
        try:
            sequence = change_encoding(sequence, DNAEncoding)
        except EncodingError:
            logger.error("Could not encode sequences as DNA; ensure only "
                         "A/C/G/T")
            raise
    assert is_subclass_or_instance(sequence.encoding, AlphabetEncoding), \
        "Sequence needs an AlphabetEncoding (e.g. DNAEncoding); use " \
        "bnp.change_encoding first"
    was_flat = isinstance(sequence, EncodedArray)
    if was_flat:
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    if sequence.encoding.alphabet_size == 4:
        result = _device_dna_kmers(sequence, k)
    else:
        result = KmerEncoder(k, sequence.encoding).rolling_window(sequence)
    if was_flat:
        return result[0] if len(result) else result
    return result


@streamable(sum)
def count_kmers(sequence, k: int, axis=None) -> EncodedCounts:
    """Count occurrences of each k-mer (reference:
    bionumpy/sequence/kmers.py:130-145).

    For 4-letter alphabets with k <= 12 the full 4^k count vector is
    produced by the device scatter-add kernel without materializing the
    hash array on host.

    Examples
    --------
    >>> import bionumpy_tpu as bnp
    >>> seqs = bnp.as_encoded_array(["ACACG", "ACG"], bnp.DNAEncoding)
    >>> counts = bnp.count_kmers(seqs, 2)
    >>> counts.most_common(3)
    EncodedCounts(alphabet=['AC', 'CG', 'CA'], counts=array([3, 2, 1]), row_names=None)
    >>> int(counts["AC"])
    3
    """
    sequence = as_encoded_array(sequence)
    if axis is None and _device_countable(sequence, k):
        return _device_count_kmers(sequence, k)
    if axis is None and _device_sparse_countable(sequence, k):
        return _device_count_kmers_sparse(sequence, k)
    kmers = get_kmers(sequence, k)
    return count_encoded(kmers, axis=axis)


def _device_countable(sequence, k: int) -> bool:
    enc = getattr(sequence, "encoding", None)
    if enc == BaseEncoding:
        return False  # needs re-encoding first; handled by generic path
    return (is_subclass_or_instance(enc, AlphabetEncoding) and
            enc.alphabet_size == 4 and k <= 12)


def _device_count_kmers(sequence, k: int) -> EncodedCounts:
    from ..ops.kmers import kmer_count_small_packed
    from ..ops.resident import device_seqs

    if isinstance(sequence, EncodedArray):
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    ds = device_seqs(sequence)
    counts = np.asarray(kmer_count_small_packed(
        ds.words, ds.ends, k, 4 ** k, ds.n))
    encoding = KmerEncoding(sequence.encoding, k)
    if k <= 8:
        alphabet = encoding.get_labels()
    else:
        alphabet = list(range(4 ** k))
    return EncodedCounts(alphabet, counts.astype(np.int64))


def _device_sparse_countable(sequence, k: int) -> bool:
    enc = getattr(sequence, "encoding", None)
    if enc == BaseEncoding:
        return False
    return (is_subclass_or_instance(enc, AlphabetEncoding) and
            enc.alphabet_size == 4 and 12 < k < 32)


def _device_count_kmers_sparse(sequence, k: int) -> SparseEncodedCounts:
    """Count k-mers whose label space cannot be enumerated (k up to 31):
    the device two-key-sorts the hash limbs and compacts them to
    (hash, count) run tables (ops/kmers.kmer_sorted_runs_packed), so the
    D2H transfer is proportional to the DISTINCT kmers only.  The
    reference cannot count these at all (bincount over 4**k,
    bionumpy/sequence/count_encoded.py:168-173)."""
    from ..ops.kmers import sparse_count_tables
    from ..ops.resident import device_seqs

    if isinstance(sequence, EncodedArray):
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    ds = device_seqs(sequence)
    hashes, counts = sparse_count_tables(ds.words, ds.ends, k, ds.n)
    encoding = KmerEncoding(sequence.encoding, k)
    return SparseEncodedCounts(encoding, hashes, counts.astype(np.int64))
