"""Data-parallel k-mer counting over a device mesh.

Each shard holds a slice of the flat code buffer (with its own
distance-to-row-end vector, so windows never cross shard boundaries —
file shards are split on entry boundaries by the host reader exactly as
the reference carries incomplete entries between chunks,
reference: bionumpy/io/parser.py:160-165).  Per-shard partial counts
are merged with psum over ICI — the device twin of the reference's
stream-reduction combiners (bionumpy/streams/reductions.py:6-23).
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

from ..ops.kmers import kmer_hash_limbs


def _local_count(codes, dist, k: int, n_counts: int):
    lo, _ = kmer_hash_limbs(codes, k)
    valid = dist[: lo.shape[0]] >= k
    indices = jnp.where(valid, lo, n_counts).astype(jnp.int32)
    counts = jnp.zeros(n_counts + 1, dtype=jnp.int32).at[indices].add(1)
    return counts[:-1]


def parallel_count_kmers(mesh: Mesh, codes_sharded: jnp.ndarray,
                         dist_sharded: jnp.ndarray, k: int, n_counts: int):
    """codes_sharded: (n_shards, shard_len + 32) uint8, sharded over dp.
    Returns replicated counts of shape (n_counts,)."""

    @partial(shard_map, mesh=mesh, in_specs=(P("dp", None), P("dp", None)),
             out_specs=P())
    def step(codes_block, dist_block):
        local = _local_count(codes_block[0], dist_block[0], k, n_counts)
        return jax.lax.psum(local, "dp")

    return jax.jit(step)(codes_sharded, dist_sharded)


def parallel_composition(mesh: Mesh, codes_sharded: jnp.ndarray,
                         dist_sharded: jnp.ndarray, n_symbols: int = 4):
    """Per-symbol composition counts merged over the mesh."""

    @partial(shard_map, mesh=mesh, in_specs=(P("dp", None), P("dp", None)),
             out_specs=P())
    def step(codes_block, dist_block):
        dist = dist_block[0]
        codes = codes_block[0][: dist.shape[0]]
        valid = dist >= 1
        indices = jnp.where(valid, codes.astype(jnp.int32), n_symbols)
        local = jnp.zeros(n_symbols + 1,
                          dtype=jnp.int32).at[indices].add(1)[:-1]
        return jax.lax.psum(local, "dp")

    return jax.jit(step)(codes_sharded, dist_sharded)


def sharded_pipeline_step(mesh: Mesh, k: int, n_counts: int,
                          n_symbols: int = 4):
    """The full jitted multi-chip step: per-shard parse results in, merged
    (kmer_counts, composition, n_valid_kmers) out.  This is the function
    the multi-chip dryrun compiles and executes."""

    @partial(shard_map, mesh=mesh, in_specs=(P("dp", None), P("dp", None)),
             out_specs=(P(), P(), P()))
    def step(codes_block, dist_block):
        codes = codes_block[0]
        dist = dist_block[0]
        counts = _local_count(codes, dist, k, n_counts)
        valid = dist[: codes.shape[0]] >= 1
        indices = jnp.where(valid[: codes.shape[0] - 32],
                            codes[: codes.shape[0] - 32].astype(jnp.int32),
                            n_symbols)
        comp = jnp.zeros(n_symbols + 1,
                         dtype=jnp.int32).at[indices].add(1)[:-1]
        n_kmers = (dist >= k).sum()
        return (jax.lax.psum(counts, "dp"), jax.lax.psum(comp, "dp"),
                jax.lax.psum(n_kmers, "dp"))

    return jax.jit(step)


def shard_flat_codes(flat_codes, lengths, n_shards: int):
    """Host-side: split a ragged chunk into n_shards row-aligned shards of
    equal padded length; returns (codes (n,La+32), dist (n,La)) arrays."""
    import numpy as np
    from ..ops.device import distance_to_row_end

    offsets = np.insert(np.cumsum(lengths), 0, 0)
    targets = (np.arange(1, n_shards) * offsets[-1]) // n_shards
    split_rows = np.searchsorted(offsets, targets)
    row_bounds = np.concatenate([[0], split_rows, [len(lengths)]])
    dist_full = distance_to_row_end(np.asarray(lengths))
    shard_lens = [int(offsets[row_bounds[i + 1]] - offsets[row_bounds[i]])
                  for i in range(n_shards)]
    max_len = max(shard_lens + [16])
    padded = ((max_len + 15) // 16) * 16
    codes = np.zeros((n_shards, padded + 32), dtype=np.uint8)
    dist = np.zeros((n_shards, padded), dtype=np.int32)
    for i in range(n_shards):
        start = int(offsets[row_bounds[i]])
        stop = int(offsets[row_bounds[i + 1]])
        codes[i, : stop - start] = flat_codes[start:stop]
        dist[i, : stop - start] = dist_full[start:stop]
    return codes, dist
