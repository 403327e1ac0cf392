"""Bloom filters over k-mer hashes (reference:
bionumpy/sequence/bloom_filter.py:21-61)."""
from __future__ import annotations

from functools import reduce

import numpy as np


def hash_function(offset):
    def f(kmer):
        return np.asarray(kmer) ^ offset
    return f


class BloomFilter:
    def __init__(self, mask_size, hash_functions):
        self._hash_functions = hash_functions
        self._mask = np.zeros(mask_size, dtype=bool)

    @classmethod
    def from_m_and_k(cls, m, k, seed=12345):
        offsets = np.random.RandomState(seed).randint(0, m, k)
        return cls(m, [hash_function(offset) for offset in offsets])

    @classmethod
    def from_hash_functions_and_sequences(cls, hash_functions, sequence,
                                          mask_size):
        bloom_filter = cls(mask_size, hash_functions)
        bloom_filter.insert(sequence)
        return bloom_filter

    # reference spelling kept for compatibility
    from_hash_functions_and_seqeuences = from_hash_functions_and_sequences

    def insert(self, sequences):
        for function in self._hash_functions:
            self._mask[function(sequences) % self._mask.size] = True

    def __getitem__(self, idx):
        return reduce(np.logical_and,
                      (self._mask[h(idx) % self._mask.size]
                       for h in self._hash_functions))


class InterleavedBloomFilter:
    def __init__(self, hash_functions, mask):
        self._hash_functions = hash_functions
        self._mask = mask

    @classmethod
    def from_hash_functions_and_sequences(cls, hash_functions, sequences,
                                          mask_size):
        mask = np.zeros((mask_size, len(sequences)), dtype=bool)
        for function in hash_functions:
            for i, sequence in enumerate(sequences):
                mask[function(sequence) % mask_size, i] = True
        return cls(hash_functions, mask)

    from_hash_functions_and_seqeuences = from_hash_functions_and_sequences

    def __getitem__(self, idx):
        kmer, seq_idx = idx
        return np.all([self._mask[h(kmer) % self._mask.shape[0], seq_idx]
                       for h in self._hash_functions], axis=0)
