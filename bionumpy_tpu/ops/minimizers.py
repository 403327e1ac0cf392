"""Device minimizer kernel: windowed lexicographic min over (hi, lo)
k-mer hash limbs (reference algorithm: bionumpy/sequence/minimizers.py —
kmer rolling window then min(axis=-1))."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kmers import kmer_hash_limbs


def _pair_min(hi_a, lo_a, hi_b, lo_b):
    take_b = (hi_b < hi_a) | ((hi_b == hi_a) & (lo_b < lo_a))
    return (jnp.where(take_b, hi_b, hi_a), jnp.where(take_b, lo_b, lo_a))


@partial(jax.jit, static_argnames=("k", "n_kmers"))
def minimizer_limbs_packed(words: jnp.ndarray, k: int, n_kmers: int):
    """(lo, hi) minimum k-mer hash limbs over each `n_kmers`-window from
    2-bit-packed words (0.25 B/base H2D; validity is the caller's
    affair, mirroring kmer_limbs_packed)."""
    from .kmers import _window_limbs
    n = (words.shape[0] - 2) * 16
    lo, hi = _window_limbs(words, n, k)
    span = 1
    while span < n_kmers:
        step = min(span, n_kmers - span)
        hi_shift = jnp.concatenate([hi[step:],
                                    jnp.full(step, 0xFFFFFFFF, jnp.uint32)])
        lo_shift = jnp.concatenate([lo[step:],
                                    jnp.full(step, 0xFFFFFFFF, jnp.uint32)])
        hi, lo = _pair_min(hi, lo, hi_shift, lo_shift)
        span += step
    return lo, hi


@partial(jax.jit, static_argnames=("k", "n_kmers"))
def minimizer_pairs_packed(words: jnp.ndarray, k: int, n_kmers: int):
    """Like minimizer_limbs_packed but returns ONE (n, 2) uint32 array
    [lo, hi] so the host fetches a single contiguous blob and reads it
    as int64 with a zero-copy view (the separate lo/hi fetches plus a
    host-side 64-bit combine measured 4.6 s for 12 Mbases on a
    throttled host; this path makes it one D2H + a view)."""
    lo, hi = minimizer_limbs_packed(words, k, n_kmers)
    return jnp.stack([lo, hi], axis=-1)


@partial(jax.jit, static_argnames=("k", "n_kmers", "cap"))
def minimizer_table_packed(words: jnp.ndarray, ends: jnp.ndarray,
                           n_true, k: int, n_kmers: int, cap: int):
    """Compacted (minimizer, count) table from packed words: windowed
    min + the shared sort/compact core, so D2H scales with DISTINCT
    minimizers (the materializing get_minimizers path is D2H-bound at
    genome scale).  Counts are per minimizer WINDOW (each of the
    n_valid windows contributes its minimum), matching
    count_encoded(get_minimizers(...)).

    Returns (table (3, cap) uint32 [lo, hi, run_start], meta (2,) int32
    [n_unique, n_valid])."""
    from .kmers import sorted_runs_from_limbs

    lo, hi = minimizer_limbs_packed(words, k, n_kmers)
    n_positions = lo.shape[0]
    window_size = n_kmers + k - 1
    marks = jnp.zeros(n_positions + 1, jnp.int32)
    marks = marks.at[jnp.maximum(ends - (window_size - 1), 0)].add(1)
    marks = marks.at[ends].add(-1)
    invalid = jnp.cumsum(marks[:-1]) > 0
    pos = jnp.arange(n_positions)
    valid = ~invalid & (pos < jnp.minimum(ends[-1], n_true))
    uniq_lo, uniq_hi, run_starts, n_unique, n_valid = \
        sorted_runs_from_limbs(lo, hi, valid, min(cap, n_positions))
    table = jnp.stack([uniq_lo, uniq_hi, run_starts.astype(jnp.uint32)])
    meta = jnp.stack([n_unique.astype(jnp.int32),
                      n_valid.astype(jnp.int32)])
    return table, meta


@partial(jax.jit, static_argnames=("k", "n_kmers"))
def minimizer_limbs(codes_padded: jnp.ndarray, dist_padded: jnp.ndarray,
                    k: int, n_kmers: int):
    """(lo, hi, valid) of the minimum k-mer hash over each window of
    `n_kmers` consecutive k-mers; window at flat position i is valid iff
    the whole span of window_size = n_kmers + k - 1 bases fits in i's row.

    Windowed min is computed with a log2(n_kmers) doubling sweep over
    shifted copies — O(log w) vector ops instead of w.
    """
    lo, hi = kmer_hash_limbs(codes_padded, k)
    n = lo.shape[0]
    # sliding-min via doubling: min over [i, i+span)
    span = 1
    while span < n_kmers:
        step = min(span, n_kmers - span)
        hi_shift = jnp.concatenate([hi[step:],
                                    jnp.full(step, 0xFFFFFFFF, jnp.uint32)])
        lo_shift = jnp.concatenate([lo[step:],
                                    jnp.full(step, 0xFFFFFFFF, jnp.uint32)])
        hi, lo = _pair_min(hi, lo, hi_shift, lo_shift)
        span += step
    window_size = n_kmers + k - 1
    valid = dist_padded[:n] >= window_size
    return lo, hi, valid
