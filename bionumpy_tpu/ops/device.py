"""Device plumbing: bucket padding + flat ragged transport.

Shapes under jit must be static; ragged chunks are transported as flat
buffers padded to geometric buckets so the number of distinct compiled
shapes stays logarithmic in chunk size (SURVEY §7 step 1).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

_BUCKET_FACTOR = 2  # power-of-two buckets


def bucket_size(n: int, minimum: int = 1024) -> int:
    """Smallest power-of-two bucket >= n."""
    size = minimum
    while size < n:
        size *= _BUCKET_FACTOR
    return size


def pad_to_bucket(arr: np.ndarray, fill_value=0,
                  minimum: int = 1024) -> Tuple[np.ndarray, int]:
    """Pad a flat host array into its bucket; returns (padded, true_len)."""
    n = len(arr)
    size = bucket_size(n, minimum)
    if size == n:
        return arr, n
    out = np.full(size, fill_value, dtype=arr.dtype)
    out[:n] = arr
    return out, n


def flat_and_lengths(ragged) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (flat uint8 codes, row lengths) from an EncodedRaggedArray /
    EncodedArray / RaggedArray."""
    from ..encoded_array import EncodedArray, EncodedRaggedArray
    from ..ragged import RaggedArray
    if isinstance(ragged, EncodedRaggedArray):
        return np.asarray(ragged.ravel().raw()), np.asarray(ragged.lengths)
    if isinstance(ragged, EncodedArray):
        data = np.asarray(ragged.raw())
        if data.ndim == 2:
            return data.ravel(), np.full(len(data), data.shape[1])
        return data, np.array([len(data)])
    if isinstance(ragged, RaggedArray):
        return np.asarray(ragged.ravel()), np.asarray(ragged.lengths)
    data = np.asarray(ragged)
    if data.ndim == 2:
        return data.ravel(), np.full(len(data), data.shape[1])
    return data.ravel(), np.array([data.size])


def distance_to_row_end(lengths: np.ndarray) -> np.ndarray:
    """d[i] = how many elements remain in i's row including i.

    A window of length k starting at flat position i stays inside its row
    iff d[i] >= k — this is the halo/trim rule the reference implements by
    computing garbage windows and slicing them off
    (reference: bionumpy/sequence/rollable.py:57-69)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int32)
    ends = np.cumsum(lengths)
    return (np.repeat(ends, lengths) -
            np.arange(total, dtype=np.int64)).astype(np.int32)
