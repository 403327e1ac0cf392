"""Device genomic-track kernels: dense binned pileup and GC content.

The reference computes these with host RLE algebra
(RunLength2dArray.from_intervals(...).sum(axis=0), reference:
bionumpy/arithmetics/intervals.py:137-163, and BinnedGenome bincounts,
genomic_data/binned_genome.py:7-44).  When the bin/position count fits
HBM, the dense formulation is a better fit for the TPU: the pileup is a
boundary-diff scatter + one cumsum, the GC track is an unpack + reshape
+ row-sum (VPU-only, one HBM pass), and both partials are psum-able
across a mesh (parallel/reductions.py holds the sharded twins).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WORD_BASES = 16


@partial(jax.jit, static_argnames=("n_positions",))
def dense_pileup(starts: jnp.ndarray, stops: jnp.ndarray,
                 valid: jnp.ndarray, n_positions: int) -> jnp.ndarray:
    """Interval depth over [0, n_positions): +1/-1 boundary scatter and
    one cumsum (the flat event formulation the reference keeps as RLE,
    bionumpy/arithmetics/bedgraph.py:22-34)."""
    s_idx = jnp.where(valid, starts, n_positions)
    e_idx = jnp.where(valid, stops, n_positions)
    diff = jnp.zeros(n_positions + 1, jnp.int32)
    diff = diff.at[s_idx].add(1).at[e_idx].add(-1)
    return jnp.cumsum(diff[:-1])


@partial(jax.jit, static_argnames=("n_bins", "bin_size"))
def binned_pileup(starts: jnp.ndarray, stops: jnp.ndarray,
                  valid: jnp.ndarray, n_bins: int,
                  bin_size: int) -> jnp.ndarray:
    """Total covered-base count per bin (= sum of interval overlap
    lengths): a full-bin range-add via boundary diff + cumsum, plus the
    partial contributions of each interval's first and last bin — no
    per-interval loops."""
    limit = n_bins * bin_size
    s = jnp.where(valid, starts, limit).astype(jnp.int32)
    e = jnp.where(valid, stops, limit).astype(jnp.int32)
    s_bin = s // bin_size
    e_bin = e // bin_size
    size = n_bins + 2
    # full bins strictly between s_bin and e_bin get bin_size each
    opens = jnp.zeros(size, jnp.int32)
    opens = opens.at[s_bin + 1].add(1)
    opens = opens.at[jnp.maximum(e_bin, s_bin + 1)].add(-1)
    full = jnp.cumsum(opens[:n_bins]) * bin_size
    own = jnp.zeros(size, jnp.int32)
    own = own.at[s_bin].add(
        jnp.minimum((s_bin + 1) * bin_size - s, e - s))
    own = own.at[e_bin].add(
        jnp.where(e_bin > s_bin, e - e_bin * bin_size, 0))
    return full + own[:n_bins]


@partial(jax.jit, static_argnames=("bin_size",))
def gc_binned_phase(words: jnp.ndarray, n_true, bin_size: int, phase):
    """gc_binned_from_packed for a CHUNK whose global start position S
    has S % bin_size == phase (a DEVICE scalar, so every equal-bucket
    chunk shares one compiled program): bins align to the GLOBAL bin
    grid, so a chunk's first (partial) bin sums with the previous
    chunk's last — the host stitches per-chunk bins by plain addition
    at offset S // bin_size (the chunked config-3 pipeline).  Output
    length is the phase-independent bound n_positions//bin_size + 2;
    trailing bins are zero."""
    n_positions = (words.shape[0] - 2) * WORD_BASES
    p0 = jnp.repeat(words[:-2], WORD_BASES)
    bit = jnp.tile(jnp.arange(WORD_BASES, dtype=jnp.uint32) * 2,
                   words.shape[0] - 2)
    codes = ((p0 >> bit) & 3).astype(jnp.uint8)
    pos = jnp.arange(n_positions)
    is_gc = ((codes == 1) | (codes == 2)) & (pos < n_true)
    csum = jnp.cumsum(is_gc.astype(jnp.int32))
    n_bins = n_positions // bin_size + 2
    b = jnp.arange(n_bins)
    end = jnp.clip((b + 1) * bin_size - phase, 0, n_positions)
    start = jnp.clip(b * bin_size - phase, 0, n_positions)
    hi = jnp.where(end > 0, csum[jnp.maximum(end - 1, 0)], 0)
    lo = jnp.where(start > 0, csum[jnp.maximum(start - 1, 0)], 0)
    return hi - lo


@partial(jax.jit, static_argnames=("bin_size",))
def gc_binned_from_packed(words: jnp.ndarray, n_true, bin_size: int):
    """GC count per bin from 2-bit-packed words (ACGT codes: C=1, G=2):
    unpack + compare + one cumsum + a gather at the bin edges — exact
    for ANY bin_size, one pass over HBM, no scatters."""
    n_positions = (words.shape[0] - 2) * WORD_BASES
    p0 = jnp.repeat(words[:-2], WORD_BASES)
    bit = jnp.tile(jnp.arange(WORD_BASES, dtype=jnp.uint32) * 2,
                   words.shape[0] - 2)
    codes = ((p0 >> bit) & 3).astype(jnp.uint8)
    pos = jnp.arange(n_positions)
    is_gc = ((codes == 1) | (codes == 2)) & (pos < n_true)
    csum = jnp.cumsum(is_gc.astype(jnp.int32))
    n_bins = -(-n_positions // bin_size)
    b = jnp.arange(n_bins)
    hi = csum[jnp.minimum((b + 1) * bin_size, n_positions) - 1]
    lo = jnp.where(b > 0, csum[jnp.maximum(b * bin_size - 1, 0)], 0)
    return hi - lo


def gc_track(sequence, bin_size: int = 1000) -> np.ndarray:
    """GC count per `bin_size` window of an encoded sequence — the
    device path for the config-3 GC genomic track (the host twin is
    np.add.reduceat over (code==1)|(code==2)).  The last bin covers only
    the true tail.  Returns a host int32 array of ceil(n/bin_size) bins.
    """
    from .resident import device_seqs

    ds = device_seqs(sequence)
    bins = np.asarray(gc_binned_from_packed(ds.words, ds.n, bin_size))
    n_real = -(-ds.n // bin_size)
    return bins[:n_real]
