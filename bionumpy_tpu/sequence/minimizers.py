"""Minimizer extraction — device windowed-min over hash limbs
(reference semantics: bionumpy/sequence/minimizers.py:8-54)."""
from __future__ import annotations

import numpy as np

from ..encoded_array import (EncodedArray, EncodedRaggedArray,
                             as_encoded_array)
from ..encodings.alphabet_encoding import AlphabetEncoding
from ..encodings.kmer_encodings import KmerEncoding
from ..ragged import RaggedShape, RaggedView
from ..util import is_subclass_or_instance
from .kmers import KmerEncoder
from .rollable import RollableFunction


class Minimizers(RollableFunction):
    """Host fallback rollable (reference:
    bionumpy/sequence/minimizers.py:8-16)."""

    def __init__(self, n_kmers, kmer_encoder: KmerEncoder):
        self._n_kmers = n_kmers
        self._kmer_encoder = kmer_encoder
        self.window_size = n_kmers + kmer_encoder.window_size - 1
        self._encoding = kmer_encoder._encoding

    def __call__(self, sequence):
        kmer_hashes = self._kmer_encoder.rolling_window(sequence)
        return EncodedArray(kmer_hashes.raw().min(axis=-1),
                            kmer_hashes.encoding)


def get_minimizers(sequence, k: int, window_size: int) -> EncodedRaggedArray:
    """Minimum k-mer hash in every window of `window_size` bases.

    Examples
    --------
    >>> import bionumpy_tpu as bnp
    >>> seqs = bnp.as_encoded_array(["ACGTACGT"], bnp.DNAEncoding)
    >>> bnp.sequence.get_minimizers(seqs, k=2, window_size=4)
    encoded_ragged_array([[AC, TA, TA, TA, AC]], 2merEncoding(AlphabetEncoding('ACGT')))
    """
    sequence = as_encoded_array(sequence)
    assert is_subclass_or_instance(sequence.encoding, AlphabetEncoding), \
        "Sequence needs an AlphabetEncoding, e.g. DNAEncoding"
    assert k <= window_size, "kmer size must be <= window size"
    was_flat = isinstance(sequence, EncodedArray)
    if was_flat:
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    if sequence.encoding.alphabet_size == 4:
        result = _device_minimizers(sequence, k, window_size)
    else:
        result = Minimizers(window_size - k + 1,
                            KmerEncoder(k, sequence.encoding)
                            ).rolling_window(sequence)
    if was_flat:
        return result[0] if len(result) else result
    return result


def count_minimizers(sequence, k: int, window_size: int,
                     cap: int = 1 << 20):
    """Count occurrences of each minimizer (one per window) — the sparse
    device-compacted twin of count_encoded(get_minimizers(...)); D2H is
    proportional to the DISTINCT minimizers, so genome-scale inputs
    don't ship every window's value through the link.

    Examples
    --------
    >>> import bionumpy_tpu as bnp
    >>> seqs = bnp.as_encoded_array(["ACGTACGT"], bnp.DNAEncoding)
    >>> c = bnp.sequence.count_minimizers(seqs, k=2, window_size=4)
    >>> sorted(zip(c.alphabet, (int(x) for x in c.counts)))
    [('AC', 2), ('TA', 3)]
    """
    import numpy as _np

    from ..encodings.kmer_encodings import KmerEncoding
    from ..ops.minimizers import minimizer_table_packed
    from ..ops.resident import device_seqs
    from .count_encoded import SparseEncodedCounts

    sequence = as_encoded_array(sequence)
    assert is_subclass_or_instance(sequence.encoding, AlphabetEncoding) \
        and sequence.encoding.alphabet_size == 4, \
        "device minimizer counting needs a 4-letter alphabet"
    assert k <= window_size
    if isinstance(sequence, EncodedArray):
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    ds = device_seqs(sequence)
    while True:
        table, meta = minimizer_table_packed(
            ds.words, ds.ends, ds.n, k, window_size - k + 1,
            min(cap, ds.n_positions))
        m = _np.asarray(meta)
        n_uni, n_val = int(m[0]), int(m[1])
        if n_uni <= cap or cap >= ds.n_positions:
            break
        cap *= 2
    # delta-packed 8 B/row fetch (ops/fetch_pack), raw 12 B/row fallback;
    # fetch length rounds to a 256k-row quantum (slice-program reuse)
    # instead of a power-of-two bucket, which over-fetches up to 2x
    import jax.numpy as _jnp

    from ..ops.fetch_pack import (HEAD, pack_runs_table,
                                  unpack_sorted_table)
    q = 1 << 18
    n_fetch = min(max(4096, (n_uni + q - 1) // q * q),
                  int(table.shape[1]))
    slab = _np.asarray(pack_runs_table(
        table, _jnp.int32(n_uni), _jnp.int32(n_val))[:, :HEAD + n_fetch])
    out = unpack_sorted_table(slab)
    if out is not None:
        hashes, counts = out
    else:
        t = _np.asarray(table[:, :n_fetch])
        hashes = (t[0, :n_uni].astype(_np.uint64) |
                  (t[1, :n_uni].astype(_np.uint64) << _np.uint64(32)))
        counts = _np.diff(t[2, :n_uni].astype(_np.int64), append=n_val)
    return SparseEncodedCounts(KmerEncoding(sequence.encoding, k),
                               hashes, counts)


def _device_minimizers(sequence: EncodedRaggedArray, k: int,
                       window_size: int) -> EncodedRaggedArray:
    from ..ops.device import bucket_size
    from ..ops.minimizers import minimizer_pairs_packed
    from ..ops.resident import device_seqs

    ds = device_seqs(sequence)
    lengths = ds.lengths
    n_kmers = window_size - k + 1
    pairs = minimizer_pairs_packed(ds.words, k, n_kmers)
    n_fetch = min(bucket_size(max(ds.n, 1), 1 << 14), ds.n_positions)
    # one contiguous D2H; little-endian (lo, hi) pairs ARE int64
    flat_pairs = np.ascontiguousarray(
        np.asarray(pairs[:n_fetch].reshape(-1)))
    hashes = flat_pairs.view(np.int64)[:ds.n]
    out_lengths = np.maximum(lengths - window_size + 1, 0)
    starts = np.insert(np.cumsum(lengths), 0, 0)[:-1]
    valid = hashes[RaggedView(starts, out_lengths).get_flat_indices()]
    return EncodedRaggedArray(
        EncodedArray(valid, KmerEncoding(sequence.encoding, k)),
        RaggedShape(out_lengths))
