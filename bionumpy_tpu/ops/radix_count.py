"""Radix-partition sparse k-mer counting prototype (VERDICT r2 item 9).

Alternative to the full two-key sort in ops/kmers.sorted_runs_from_limbs:

1. ONE single-key stable sort groups elements by their radix bucket
   (the top bits of the 62-bit hash, so buckets are globally ordered);
2. elements scatter collision-free into a (n_buckets, bucket_cap)
   padded matrix (within-bucket offset = sorted position − bucket
   start, from a bincount cumsum);
3. ONE two-key lax.sort along the last axis sorts every bucket row
   independently — log2(bucket_cap) compare stages instead of log2(n)
   for the expensive two-key pass;
4. the raveled bucket-major array is globally sorted (sentinel-padded),
   so the usual run detection + stable-re-sort compaction apply.

Trades: the cheap 1-key pass + a scatter + ~2x padded row sort versus
the saved two-key log factor.  Benchmarked against the sort path on
the real 2^25 batch by benchmarks/radix_vs_sort.py; numbers recorded
in docs/performance.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_SENTINEL = 0xFFFFFFFF


@partial(jax.jit, static_argnames=("k", "n_buckets", "bucket_cap", "cap"))
def radix_sorted_runs(lo, hi, valid, k: int, n_buckets: int,
                      bucket_cap: int, cap: int):
    """Run-compacted unique (lo, hi) limb pairs with counts.

    Returns (uniq_lo, uniq_hi, counts int32, n_unique, n_valid,
    overflowed) — `overflowed` flags any bucket exceeding bucket_cap
    (the caller retries with more buckets or falls back to the full
    sort)."""
    n = lo.shape[0]
    hash_bits = 2 * k
    bucket_bits = (n_buckets - 1).bit_length()
    sentinel = jnp.uint32(_SENTINEL)
    hi_k = jnp.where(valid, hi, sentinel)
    lo_k = jnp.where(valid, lo, sentinel)
    # bucket = the hash's TOP bits (from hi when the hash spans both
    # limbs, else from lo), so bucket order == (hi, lo) sort order
    if hash_bits > 32:
        key = hi >> jnp.uint32(max(hash_bits - 32 - bucket_bits, 0))
    else:
        key = lo >> jnp.uint32(max(hash_bits - bucket_bits, 0))
    # invalid slots get their own overflow bucket id so they sort after
    # every real bucket and never perturb within-bucket ranks
    bucket = jnp.where(valid, jnp.minimum(key, n_buckets - 1),
                       jnp.uint32(n_buckets))

    # 1. group by bucket: ONE cheap single-key stable sort
    b_s, lo_g, hi_g = jax.lax.sort((bucket, lo_k, hi_k), num_keys=1,
                                   is_stable=True)

    # 2. collision-free scatter into padded bucket rows (invalid rows
    # compute an out-of-range slot and are dropped)
    occupancy = jnp.zeros(n_buckets + 1, jnp.int32).at[
        b_s.astype(jnp.int32)].add(1, mode="drop")
    row_start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(occupancy)[:-1]])
    within = jnp.arange(n, dtype=jnp.int32) - \
        jnp.take(row_start, b_s.astype(jnp.int32))
    overflowed = occupancy[:n_buckets].max() > bucket_cap
    in_cap = within < bucket_cap
    slot = jnp.where(
        (b_s < n_buckets) & in_cap,
        b_s.astype(jnp.int32) * bucket_cap + within,
        n_buckets * bucket_cap)
    table_lo = jnp.full(n_buckets * bucket_cap, sentinel)
    table_hi = jnp.full(n_buckets * bucket_cap, sentinel)
    table_lo = table_lo.at[slot].set(lo_g, mode="drop")
    table_hi = table_hi.at[slot].set(hi_g, mode="drop")

    # 3. per-bucket two-key sort: one call over the row axis
    h_s, l_s = jax.lax.sort(
        (table_hi.reshape(n_buckets, bucket_cap),
         table_lo.reshape(n_buckets, bucket_cap)),
        dimension=1, num_keys=2)
    hi_s = h_s.reshape(-1)
    lo_s = l_s.reshape(-1)

    # 4. run detection + compaction on the globally-ordered ravel
    m = hi_s.shape[0]
    live = ~((hi_s == sentinel) & (lo_s == sentinel))
    is_new = jnp.concatenate([
        jnp.ones(1, bool),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]) & live
    n_unique = is_new.sum()
    n_valid = valid.sum()
    pos = jnp.arange(m, dtype=jnp.int32)
    _, p2 = jax.lax.sort(((~is_new).astype(jnp.uint32), pos),
                         num_keys=1, is_stable=True)
    starts = p2[:cap]
    live_cum = jnp.cumsum(live.astype(jnp.int32))
    iota = jnp.arange(cap, dtype=jnp.int32)
    nxt = jnp.concatenate([starts[1:], jnp.zeros(1, starts.dtype)])
    ends = jnp.where(iota < n_unique - 1, nxt, m)
    counts = jnp.take(live_cum, jnp.maximum(ends - 1, 0)) - \
        jnp.where(starts > 0,
                  jnp.take(live_cum, jnp.maximum(starts - 1, 0)), 0)
    counts = jnp.where(iota < n_unique, counts, 0)
    return (jnp.take(lo_s, starts), jnp.take(hi_s, starts),
            counts.astype(jnp.int32), n_unique, n_valid, overflowed)
