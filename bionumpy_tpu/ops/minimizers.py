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


@partial(jax.jit, static_argnames=("k", "n_kmers", "cap", "bin_size"))
def minimizer_gc_job_packed(words: jnp.ndarray, ends: jnp.ndarray,
                            n_true, k: int, n_kmers: int, cap: int,
                            bin_size: int):
    """ONE program for the whole config-3 job: the minimizer count
    table (delta-packed for fetch, ops/fetch_pack) AND the binned GC
    track, computed from the same uploaded packed-words buffer.  The
    gc bins are PREPENDED to the packed table stream, so after the
    tiny (2,) meta probe the entire job result crosses the relay as
    ONE prefix-sliced transfer (three round-trips -> two; each extra
    round-trip costs 100ms-class latency when the relay degrades).

    Returns (slab 1-D uint32 [gc bins (n_bins_padded words), 32-bit
    packed table stream], meta (2,) int32); n_bins_padded derives from
    the PADDED position bucket (the host slices to the real bins).
    Rows are 4 B (24-bit delta + 8-bit count, ops/fetch_pack
    pack_sorted_table32) — minimizer tables fit it with a 2^16-row
    exception block, halving the dominant D2H."""
    from .fetch_pack import pack_runs_table32
    from .tracks import gc_binned_from_packed

    table, meta = minimizer_table_packed(words, ends, n_true, k,
                                         n_kmers, cap)
    gc = gc_binned_from_packed(words, n_true, bin_size)
    slab = pack_runs_table32(table, meta[0], meta[1])
    return jnp.concatenate([gc.astype(jnp.uint32), slab]), meta


@partial(jax.jit, static_argnames=("k", "n_kmers", "cap", "bin_size"))
def minimizer_sentinel_gc_group(words: jnp.ndarray, ends: jnp.ndarray,
                                n_true, k: int, n_kmers: int, cap: int,
                                bin_size: int, phase=0):
    """One CHUNK of the pipelined config-3 job: sentinel-padded
    (lo, hi, cnt) minimizer table (fold-ready for pipeline
    _fold_program — unused slots carry (0xFFFFFFFF, 0xFFFFFFFF, 0)),
    the (2,) meta, and the chunk's GLOBAL-grid gc bins (phase =
    chunk_start % bin_size, a device scalar).  Chunk g+1's H2D
    overlaps chunk g's sort because nothing here syncs the host."""
    from .kmers import counts_from_runs
    from .tracks import gc_binned_phase

    table, meta = minimizer_table_packed(words, ends, n_true, k,
                                         n_kmers, cap)
    cnt = counts_from_runs(table[2].astype(jnp.int32), meta[0],
                           meta[1], cap)
    valid = jnp.arange(cap, dtype=jnp.int32) < meta[0]
    sentinel = jnp.uint32(0xFFFFFFFF)
    lo_t = jnp.where(valid, table[0], sentinel)
    hi_t = jnp.where(valid, table[1], sentinel)
    cnt = jnp.where(valid, cnt, 0)
    gc = gc_binned_phase(words, n_true, bin_size, phase)
    return lo_t, hi_t, cnt.astype(jnp.int32), meta, gc


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
