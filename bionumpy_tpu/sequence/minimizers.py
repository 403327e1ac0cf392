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


_final_slab32 = None
_chunk_probe = None


def _chunk_fns():
    global _final_slab32, _chunk_probe
    if _final_slab32 is None:
        import jax
        import jax.numpy as _jnp

        from ..ops.fetch_pack import pack_sorted_table32

        @jax.jit
        def final_slab32(acc, nu, *gcs):
            return _jnp.concatenate(
                [g.astype(_jnp.uint32) for g in gcs]
                + [pack_sorted_table32(acc, nu)])

        @jax.jit
        def chunk_probe(nu, *metas):
            return _jnp.concatenate(
                [_jnp.stack(metas).reshape(-1),
                 nu.astype(_jnp.int32)[None]])

        _final_slab32 = final_slab32
        _chunk_probe = chunk_probe
    return _final_slab32, _chunk_probe


def _count_minimizers_with_gc_chunked(sequence, k: int,
                                      window_size: int, cap: int,
                                      bin_size: int, n_chunks: int,
                                      chunk_cap: int):
    """Pipelined whole-job path: rows split into ~equal-base chunks;
    each chunk's H2D overlaps the previous chunk's device sort (no
    host syncs between chunks), per-chunk sentinel tables fold into
    one accumulator (pipeline _fold_program), and the job crosses the
    relay exactly twice — the tiny meta/nu probe and ONE combined
    fetch of [all chunk gc bins, 32-bit packed table]."""
    import jax
    import numpy as _np

    from ..encodings.kmer_encodings import KmerEncoding
    from ..ops.fetch_pack import HEAD32, unpack_sorted_table32
    from ..ops.minimizers import minimizer_sentinel_gc_group
    from ..ops.resident import device_seqs
    from ..pipeline import _device_merge_fns, _sentinel_table
    from .count_encoded import SparseEncodedCounts

    lengths = _np.asarray(sequence.lengths, _np.int64)
    total = int(lengths.sum())
    cum = _np.cumsum(lengths)
    bounds = [0]
    for g in range(1, n_chunks):
        r = int(_np.searchsorted(cum, total * g // n_chunks))
        bounds.append(max(bounds[-1], min(r + 1, len(lengths))))
    bounds.append(len(lengths))

    n_kmers = window_size - k + 1
    device = jax.devices()[0]
    tables, metas, gcs, offs = [], [], [], []
    base = 0
    for g in range(n_chunks):
        r0, r1 = bounds[g], bounds[g + 1]
        if r0 >= r1:
            continue
        sub = sequence[r0:r1]
        ds = device_seqs(sub)
        lo, hi, cnt, meta, gc = minimizer_sentinel_gc_group(
            ds.words, ds.ends, ds.n, k, n_kmers,
            min(chunk_cap, ds.n_positions), bin_size,
            base % bin_size)
        tables.append((lo, hi, cnt))
        metas.append(meta)
        gcs.append(gc)
        offs.append(base // bin_size)
        base += ds.n
    assert base == total

    fold_program, make_acc, _ = _device_merge_fns()
    with jax.default_device(device):
        acc = make_acc(cap)
    arity = 1 << (len(tables) - 1).bit_length()
    while len(tables) < arity:
        tables.append(_sentinel_table(
            min(chunk_cap, tables[0][0].shape[0]), device))
    acc, acc_nu = fold_program(acc, tuple(tables), cap)

    final_slab32, chunk_probe = _chunk_fns()
    probe = _np.asarray(chunk_probe(acc_nu, *metas))
    m = probe[:-1].reshape(len(metas), 2)
    nu = int(probe[-1])
    if int(m[:, 0].max()) > chunk_cap:
        # some chunk's table truncated: one rerun at a cap that fits
        new_cap = 1 << (int(m[:, 0].max()) - 1).bit_length()
        return _count_minimizers_with_gc_chunked(
            sequence, k, window_size, cap, bin_size, n_chunks, new_cap)
    if nu >= cap:
        raise ValueError(f"distinct minimizers >= cap={cap}; raise cap")

    slab_dev = final_slab32(acc, acc_nu, *gcs)
    gc_words = sum(int(g.shape[0]) for g in gcs)
    q = 1 << 18
    n_fetch = min(max(4096, (nu + q - 1) // q * q), cap)
    slab = _np.asarray(slab_dev[: gc_words + HEAD32 + n_fetch])
    out = unpack_sorted_table32(slab[gc_words:])
    if out is None:  # exception block overflow: unchunked fallback
        counts = count_minimizers(sequence, k, window_size, cap=cap)
        from ..ops.tracks import gc_track
        return counts, gc_track(sequence, bin_size)
    hashes, counts = out
    # stitch the global-grid chunk bins (boundary bins simply add)
    n_real = -(-total // bin_size)
    per = [int(g.shape[0]) for g in gcs]
    gc_glob = _np.zeros(max([n_real] + [o + p for o, p in
                                        zip(offs, per)]), _np.int64)
    pos = 0
    for off, p in zip(offs, per):
        gc_glob[off: off + p] += slab[pos: pos + p].view(_np.int32)
        pos += p
    return SparseEncodedCounts(KmerEncoding(sequence.encoding, k),
                               hashes, counts), \
        gc_glob[:n_real].astype(_np.int32)


def count_minimizers_with_gc(sequence, k: int, window_size: int,
                             cap: int = 1 << 20, bin_size: int = 1000,
                             n_chunks: int = 1, chunk_cap: int = None):
    """count_minimizers AND the binned GC track of the same sequences
    in ONE device program and ONE combined result transfer (plus the
    tiny meta probe): the gc bins ride the front of the 32-bit
    delta-packed minimizer table stream
    (ops/minimizers.minimizer_gc_job_packed).
    Returns (SparseEncodedCounts, gc int32 array of ceil(n/bin_size)).

    The config-3 whole-job path: three relay round-trips become two,
    and the GC pass shares the sort program's upload and dispatch.
    `n_chunks > 1` pipelines the job — each chunk's H2D overlaps the
    previous chunk's device sort, tables fold into one accumulator
    (`chunk_cap` bounds a chunk's distinct minimizers; auto-retried)."""
    import numpy as _np

    from ..encoded_array import EncodedArray, EncodedRaggedArray
    from ..encodings.alphabet_encoding import AlphabetEncoding
    from ..encodings.kmer_encodings import KmerEncoding
    from ..ops.minimizers import minimizer_gc_job_packed
    from ..ops.resident import device_seqs
    from ..util import is_subclass_or_instance
    from .count_encoded import SparseEncodedCounts

    sequence = as_encoded_array(sequence)
    assert is_subclass_or_instance(sequence.encoding, AlphabetEncoding) \
        and sequence.encoding.alphabet_size == 4
    assert k <= window_size
    if isinstance(sequence, EncodedArray):
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    if n_chunks > 1 and len(sequence) >= n_chunks:
        return _count_minimizers_with_gc_chunked(
            sequence, k, window_size, cap, bin_size, n_chunks,
            chunk_cap or max(cap // n_chunks * 2, 1 << 16))
    ds = device_seqs(sequence)
    while True:
        slab_dev, meta = minimizer_gc_job_packed(
            ds.words, ds.ends, ds.n, k, window_size - k + 1,
            min(cap, ds.n_positions), bin_size)
        m = _np.asarray(meta)
        n_uni, n_val = int(m[0]), int(m[1])
        if n_uni <= cap or cap >= ds.n_positions:
            break
        cap *= 2
    from ..ops.fetch_pack import HEAD32, unpack_sorted_table32
    n_bins_padded = -(-ds.n_positions // bin_size)
    q = 1 << 18
    table_words = slab_dev.shape[0] - n_bins_padded - HEAD32
    n_fetch = min(max(4096, (n_uni + q - 1) // q * q), table_words)
    slab = _np.asarray(slab_dev[: n_bins_padded + HEAD32 + n_fetch])
    n_real = -(-ds.n // bin_size)
    gc = slab[:n_real].view(_np.int32)
    out = unpack_sorted_table32(slab[n_bins_padded:])
    if out is None:
        # packed-delta exception block overflowed (>4096 rows with
        # counts >= 2^16): take the separate-fetch path, which has the
        # raw-table fallback
        return (count_minimizers(sequence, k, window_size, cap=cap),
                gc)
    hashes, counts = out
    return SparseEncodedCounts(KmerEncoding(sequence.encoding, k),
                               hashes, counts), gc


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
