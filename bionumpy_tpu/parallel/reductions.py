"""Mesh-level reduction algebra: the reference's stream-fold combiners
lifted onto the dp axis with psum.

The reference folds per-chunk partials with four associative combiners
(reference: bionumpy/streams/reductions.py:6-23 — bincount pad-and-add,
histogram add, sum_and_n for mean — and the interval pileup,
bionumpy/arithmetics/intervals.py:137-163).  Each maps directly onto one
collective over ICI:

  bincount / composition   psum of fixed-width count vectors
                           (kmer_parallel.py)
  histogram                psum of per-shard bin counts
  sum_and_n (mean)         psum of (sum, n) pairs
  pileup                   psum of the +1/-1 boundary-diff vector, then
                           one replicated cumsum
  sparse kmer counts       all_gather + sorted merge
                           (sparse_parallel.py)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map


def sharded_histogram_step(mesh: Mesh, n_bins: int):
    """values/valid sharded over dp + replicated bin edges (n_bins+1,)
    -> replicated histogram counts (n_bins,): the psum twin of
    np.histogram folding (reference: bionumpy/streams/reductions.py:17-23).
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P()),
             out_specs=P())
    def step(values_b, valid_b, edges):
        v = values_b[0]
        valid = valid_b[0]
        # np.histogram semantics: both edges of the last bin inclusive
        idx = jnp.searchsorted(edges, v, side="right") - 1
        idx = jnp.where(v == edges[-1], n_bins - 1, idx)
        idx = jnp.where(valid & (idx >= 0) & (idx < n_bins), idx, n_bins)
        local = jnp.zeros(n_bins + 1, jnp.int32).at[idx].add(1)[:-1]
        return jax.lax.psum(local, "dp")

    return jax.jit(step)


def sharded_sum_and_n_step(mesh: Mesh):
    """(sum, n) pairs psum-merged over the mesh — the mean combiner
    (reference: bionumpy/streams/reductions.py:27-57)."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None)),
             out_specs=(P(), P()))
    def step(values_b, valid_b):
        v = values_b[0]
        valid = valid_b[0]
        s = jnp.sum(jnp.where(valid, v, 0).astype(jnp.float64)
                    if v.dtype == jnp.float64 else
                    jnp.where(valid, v, 0).astype(jnp.float32))
        n = valid.sum()
        return jax.lax.psum(s, "dp"), jax.lax.psum(n, "dp")

    return jax.jit(step)


def sharded_pileup_step(mesh: Mesh, n_positions: int):
    """Interval (start, stop) shards -> replicated whole-genome pileup:
    each shard scatters its +1/-1 boundary diff, psum merges the diffs,
    one cumsum materializes the depth (the device twin of
    RunLength2dArray.from_intervals(...).sum(axis=0), reference:
    bionumpy/arithmetics/intervals.py:137-163)."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P("dp", None)),
             out_specs=P())
    def step(starts_b, stops_b, valid_b):
        starts = starts_b[0]
        stops = stops_b[0]
        valid = valid_b[0]
        s_idx = jnp.where(valid, starts, n_positions)
        e_idx = jnp.where(valid, stops, n_positions)
        diff = jnp.zeros(n_positions + 1, jnp.int32)
        diff = diff.at[s_idx].add(1).at[e_idx].add(-1)
        merged = jax.lax.psum(diff[:-1], "dp")
        return jnp.cumsum(merged)

    return jax.jit(step)


def sharded_binned_pileup_step(mesh: Mesh, n_bins: int, bin_size: int):
    """Interval shards -> replicated BINNED coverage track (covered
    bases per bin): each shard computes its binned_pileup partial, a
    psum merges them — the psum-able form of the reference's
    whole-genome pileup at genome scale (dense positions never
    materialize; reference algorithm:
    bionumpy/arithmetics/intervals.py:137-163)."""
    from ..ops.tracks import binned_pileup

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P("dp", None)),
             out_specs=P())
    def step(starts_b, stops_b, valid_b):
        part = binned_pileup(starts_b[0], stops_b[0], valid_b[0],
                             n_bins, bin_size)
        return jax.lax.psum(part, "dp")

    return jax.jit(step)
