"""Device-resident sequence chunks: pack + upload ONCE, reuse everywhere.

The reference re-derives its BitArray per call (npstructures pack inside
bionumpy/sequence/kmers.py:106-128); in round 1 this repo likewise
re-packed and re-uploaded the flat codes inside every device op
(get_kmers -> count_kmers -> get_minimizers each paid one H2D).  This
module gives `EncodedRaggedArray` a cached device materialization:

    words   uint32[ceil(bucket/16)+2]  2-bit-packed codes in HBM
    ends    int32[n_rows]              row end offsets in HBM
    n       int                        true base count
    lengths np.ndarray                 host row lengths (for trims)

Every `_device_*` dispatch in sequence/ asks for `device_seqs(seq)`;
the first caller pays the pack + H2D, later callers get the cached
handle, so a chained `count_kmers(s, 31); get_minimizers(s, 21, 10)`
performs exactly one upload of the sequence data (asserted by
tests/test_resident.py via the transfer counters below).
"""
from __future__ import annotations

import numpy as np

# transfer accounting (tests + observability): number of device_put
# calls and total bytes shipped for sequence payloads through this module
TRANSFER_COUNT = 0
TRANSFER_BYTES = 0

_CACHE_ATTR = "_device_seqs_cache"


class DeviceSeqs:
    """One ragged chunk's packed codes + row ends, resident in HBM."""

    __slots__ = ("words", "ends", "n", "lengths", "n_positions")

    def __init__(self, words, ends, n: int, lengths: np.ndarray):
        self.words = words                      # jax uint32 on device
        self.ends = ends                        # jax int32 on device
        self.n = n                              # true base count
        self.lengths = lengths                  # host int lengths
        self.n_positions = (words.shape[0] - 2) * 16

    def __repr__(self):
        return (f"DeviceSeqs(n={self.n}, rows={len(self.lengths)}, "
                f"bucket={self.n_positions})")


def _build(flat: np.ndarray, lengths: np.ndarray,
           min_bucket: int) -> DeviceSeqs:
    global TRANSFER_COUNT, TRANSFER_BYTES
    import jax

    from ..util.jax_cache import enable_relay_compile_cache
    enable_relay_compile_cache()
    from .kmers import prepare_packed

    words, ends, n = prepare_packed(flat, lengths, min_bucket)
    words_dev = jax.device_put(words)
    ends_dev = jax.device_put(ends)
    TRANSFER_COUNT += 1
    TRANSFER_BYTES += words.nbytes + ends.nbytes
    return DeviceSeqs(words_dev, ends_dev, n, np.asarray(lengths))


def device_seqs(sequence, min_bucket: int = 1 << 14) -> DeviceSeqs:
    """Device-resident packed form of a 4-letter EncodedRaggedArray /
    EncodedArray, cached on the array instance.

    The cache is invalidated by EncodedRaggedArray.__setitem__ (the only
    mutation path); fresh arrays produced by indexing get their own
    cache entry on first use.
    """
    cached = getattr(sequence, _CACHE_ATTR, None)
    if cached is not None and cached.n_positions >= min_bucket:
        return cached
    from .device import flat_and_lengths
    flat, lengths = flat_and_lengths(sequence)
    ds = _build(flat, lengths, min_bucket)
    try:
        setattr(sequence, _CACHE_ATTR, ds)
    except AttributeError:
        pass  # plain ndarrays etc. cannot carry the cache; still works
    return ds


def invalidate(sequence) -> None:
    """Drop a stale device materialization (called on mutation)."""
    try:
        if getattr(sequence, _CACHE_ATTR, None) is not None:
            delattr(sequence, _CACHE_ATTR)
    except AttributeError:
        pass


def reset_transfer_counters() -> None:
    global TRANSFER_COUNT, TRANSFER_BYTES
    TRANSFER_COUNT = 0
    TRANSFER_BYTES = 0
