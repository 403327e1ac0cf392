"""Multi-chip sparse k-mer counting (k up to 31) over a device mesh.

The dense 4^k psum merge (kmer_parallel.py) cannot scale past k~12; the
flagship 31-mer path instead compacts each shard's hashes to a
(hash, count) table on device (ops/kmers.kmer_sorted_runs_packed), then
merges the tables ACROSS the mesh inside the same jitted program:
all_gather of the cap-bounded tables over ICI, one two-key sort of the
gathered (hi, lo) limbs with the counts as payload, and a run compaction
whose per-run totals come from a cumulative-sum difference.  This is the
device twin of SparseEncodedCounts.__add__ — the associative fold the
reference applies per chunk (reference: bionumpy/streams/reductions.py:
6-23, bionumpy/sequence/count_encoded.py:42-56) lifted to the dp axis.

All shards return the identical replicated merged table; a production
deployment at larger meshes would reduce_scatter by hash range instead
of all_gather (each device merging one residue class) — same algebra,
noted here for when a multi-host mesh is actually available.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from ..ops.kmers import WORD_BASES, kmer_sorted_runs_packed

# NOTE: a module-level jnp scalar would initialize the jax backend
# (and touch the TPU relay) at import time; a numpy scalar doesn't
_SENTINEL = np.uint32(0xFFFFFFFF)


def _local_table(words, ends, n_true, k: int, cap: int):
    """Per-shard (lo, hi, count, meta) table, sentinel-padded to cap
    rows; meta is (2,) int32 [n_unique, n_valid]."""
    from ..ops.kmers import counts_from_runs
    lo, hi, run_starts, n_unique, n_valid = kmer_sorted_runs_packed(
        words, ends, k, n_true, cap)
    cnt = counts_from_runs(run_starts, n_unique, n_valid,
                           run_starts.shape[0])
    valid = jnp.arange(run_starts.shape[0], dtype=jnp.int32) < n_unique
    lo_t = jnp.where(valid, lo, _SENTINEL)
    hi_t = jnp.where(valid, hi, _SENTINEL)
    meta = jnp.stack([n_unique.astype(jnp.int32),
                      n_valid.astype(jnp.int32)])
    return lo_t, hi_t, cnt, meta


def merge_hash_tables(lo: jnp.ndarray, hi: jnp.ndarray, cnt: jnp.ndarray,
                      cap_out: int):
    """Merge concatenated (hash-limb, count) tables: sum counts of equal
    hashes, compact unique hashes to the front.  Sentinel-keyed entries
    (0xFFFFFFFF, 0xFFFFFFFF) are dropped.  Returns
    (lo, hi, counts, n_unique) with cap_out rows."""
    n = lo.shape[0]
    cap_out = min(cap_out, n)
    hi_s, lo_s, c_s = jax.lax.sort((hi, lo, cnt), num_keys=2)
    is_new = jnp.concatenate([
        jnp.ones(1, bool),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
    pos = jnp.arange(n, dtype=jnp.int32)
    n_runs = is_new.sum()
    _, p2 = jax.lax.sort(((~is_new).astype(jnp.uint32), pos),
                         num_keys=1, is_stable=True)
    starts = p2[:cap_out]
    csum = jnp.cumsum(c_s)
    iota = jnp.arange(cap_out, dtype=jnp.int32)
    nxt = jnp.concatenate([starts[1:], jnp.zeros(1, starts.dtype)])
    ends = jnp.where(iota < n_runs - 1, nxt, n)
    totals = jnp.take(csum, jnp.maximum(ends - 1, 0)) - \
        jnp.where(starts > 0, jnp.take(csum, jnp.maximum(starts - 1, 0)),
                  0)
    m_lo = jnp.take(lo_s, starts)
    m_hi = jnp.take(hi_s, starts)
    real = (iota < n_runs) & ~((m_lo == _SENTINEL) & (m_hi == _SENTINEL))
    totals = jnp.where(real, totals, 0)
    m_lo = jnp.where(real, m_lo, _SENTINEL)
    m_hi = jnp.where(real, m_hi, _SENTINEL)
    return m_lo, m_hi, totals.astype(jnp.int32), real.sum()


def sharded_sparse_count_step(mesh: Mesh, k: int, cap: int,
                              cap_out: int = None):
    """Jitted multi-chip step: per-shard packed words/ends/n_true in,
    replicated merged (lo, hi, counts, n_unique) out."""
    if cap_out is None:
        cap_out = cap * mesh.devices.size

    # the merged outputs are replicated by construction (every shard does
    # the identical merge of the all_gathered tables), but the static
    # replication checker cannot see through lax.sort — disable it
    import inspect
    params = inspect.signature(shard_map).parameters
    check_kw = {"check_vma": False} if "check_vma" in params else \
        {"check_rep": False}

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P("dp")),
             out_specs=(P(), P(), P(), P()), **check_kw)
    def step(words_b, ends_b, n_true_b):
        lo_t, hi_t, cnt, _meta = _local_table(words_b[0], ends_b[0],
                                              n_true_b[0], k, cap)
        lo_g = jax.lax.all_gather(lo_t, "dp").reshape(-1)
        hi_g = jax.lax.all_gather(hi_t, "dp").reshape(-1)
        cnt_g = jax.lax.all_gather(cnt, "dp").reshape(-1)
        return merge_hash_tables(lo_g, hi_g, cnt_g, cap_out)

    return jax.jit(step)


_FOLD_STEP_CACHE = {}


def sharded_sparse_count_fold_step(mesh: Mesh, k: int, cap: int,
                                   acc_cap: int):
    """Jitted multi-chip ACCUMULATING step for the flagship streamed
    pipeline (pipeline.count_kmers_fastq(mesh=...)): per-shard packed
    batch in, per-shard table counted locally, tables all_gathered over
    ICI and merged WITH the replicated acc_cap-row accumulator — one
    pinned-shape program per batch, zero per-batch D2H except the tiny
    per-shard meta matrix.

    step(acc, meta_acc, words, ends, n_true) -> (new_acc (3, acc_cap)
    uint32, new_meta_acc (8,) uint32, n_unique_total scalar).  The
    meta accumulator is the single-chip pipeline's
    [max_unique, kmers_lo, kmers_hi, ...] vector folded ACROSS shards
    inside the step (pmax/psum over 'dp'), so nothing per-batch
    crosses the host link at all — meta rides the final table fetch
    exactly as on one chip.
    """
    key = (mesh, k, cap, acc_cap)
    if key in _FOLD_STEP_CACHE:
        return _FOLD_STEP_CACHE[key]

    import inspect
    params = inspect.signature(shard_map).parameters
    check_kw = {"check_vma": False} if "check_vma" in params else \
        {"check_rep": False}

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("dp", None), P("dp", None), P("dp")),
             out_specs=(P(), P(), P()), **check_kw)
    def step(acc, m_acc, words_b, ends_b, n_true_b):
        lo_t, hi_t, cnt, meta = _local_table(words_b[0], ends_b[0],
                                             n_true_b[0], k, cap)
        lo_g = jax.lax.all_gather(lo_t, "dp").reshape(-1)
        hi_g = jax.lax.all_gather(hi_t, "dp").reshape(-1)
        cnt_g = jax.lax.all_gather(cnt, "dp").reshape(-1)
        max_u = jax.lax.pmax(meta[0], "dp").astype(jnp.uint32)
        tot_v = jax.lax.psum(meta[1], "dp").astype(jnp.uint32)
        lo32 = m_acc[1] + tot_v
        carry = (lo32 < tot_v).astype(jnp.uint32)
        m_acc = m_acc.at[0].max(max_u).at[1].set(lo32).at[2].add(carry)
        lo = jnp.concatenate([acc[0], lo_g])
        hi = jnp.concatenate([acc[1], hi_g])
        c = jnp.concatenate([acc[2].astype(jnp.int32), cnt_g])
        m_lo, m_hi, m_cnt, n_u = merge_hash_tables(lo, hi, c, acc_cap)
        return (jnp.stack([m_lo, m_hi, m_cnt.astype(jnp.uint32)]),
                m_acc, n_u)

    jitted = jax.jit(step, donate_argnums=(0,))
    _FOLD_STEP_CACHE[key] = jitted
    return jitted


def _local_minimizer_table(words, ends, n_true, k: int, n_kmers: int,
                           cap: int):
    """Per-shard (lo, hi, count, meta) MINIMIZER table, sentinel-padded
    to cap rows — the minimizer twin of _local_table (one count per
    valid window, matching count_encoded(get_minimizers(...)))."""
    from ..ops.kmers import counts_from_runs
    from ..ops.minimizers import minimizer_table_packed
    table, meta = minimizer_table_packed(words, ends, n_true, k,
                                         n_kmers, cap)
    n_unique = meta[0]
    run_starts = table[2].astype(jnp.int32)
    cnt = counts_from_runs(run_starts, n_unique, meta[1],
                           run_starts.shape[0])
    valid = jnp.arange(run_starts.shape[0], dtype=jnp.int32) < n_unique
    lo_t = jnp.where(valid, table[0], _SENTINEL)
    hi_t = jnp.where(valid, table[1], _SENTINEL)
    return lo_t, hi_t, cnt, meta


def sharded_minimizer_count_fold_step(mesh: Mesh, k: int,
                                      window_size: int, cap: int,
                                      acc_cap: int):
    """Jitted multi-chip ACCUMULATING minimizer-count step for
    pipeline.count_minimizers_fastq(mesh=...): identical shape and
    merge algebra to sharded_sparse_count_fold_step, with the windowed-
    min local table.  The fold is exact because distinct-minimizer
    tables merge with the same associative (hash, count) sum the
    reference folds per chunk (reference:
    bionumpy/streams/reductions.py:6-23,
    bionumpy/sequence/minimizers.py:8-54)."""
    key = ("minimizer", mesh, k, window_size, cap, acc_cap)
    if key in _FOLD_STEP_CACHE:
        return _FOLD_STEP_CACHE[key]
    n_kmers = window_size - k + 1

    import inspect
    params = inspect.signature(shard_map).parameters
    check_kw = {"check_vma": False} if "check_vma" in params else \
        {"check_rep": False}

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("dp", None), P("dp", None), P("dp")),
             out_specs=(P(), P(), P()), **check_kw)
    def step(acc, m_acc, words_b, ends_b, n_true_b):
        lo_t, hi_t, cnt, meta = _local_minimizer_table(
            words_b[0], ends_b[0], n_true_b[0], k, n_kmers, cap)
        lo_g = jax.lax.all_gather(lo_t, "dp").reshape(-1)
        hi_g = jax.lax.all_gather(hi_t, "dp").reshape(-1)
        cnt_g = jax.lax.all_gather(cnt, "dp").reshape(-1)
        # meta folds across shards ON DEVICE (pmax/psum) and rides the
        # final table fetch — no per-window stacked meta transfers
        max_u = jax.lax.pmax(meta[0], "dp").astype(jnp.uint32)
        tot_v = jax.lax.psum(meta[1], "dp").astype(jnp.uint32)
        lo32 = m_acc[1] + tot_v
        carry = (lo32 < tot_v).astype(jnp.uint32)
        m_acc = m_acc.at[0].max(max_u).at[1].set(lo32).at[2].add(carry)
        lo = jnp.concatenate([acc[0], lo_g])
        hi = jnp.concatenate([acc[1], hi_g])
        c = jnp.concatenate([acc[2].astype(jnp.int32), cnt_g])
        m_lo, m_hi, m_cnt, n_u = merge_hash_tables(lo, hi, c, acc_cap)
        return (jnp.stack([m_lo, m_hi, m_cnt.astype(jnp.uint32)]),
                m_acc, n_u)

    jitted = jax.jit(step, donate_argnums=(0,))
    _FOLD_STEP_CACHE[key] = jitted
    return jitted


def sharded_pwm_match_step(mesh: Mesh, window_size: int, cap: int):
    """Jitted multi-chip PWM scan step: per-shard packed words/ends in,
    per-shard compacted match positions out (matches are read-local, so
    outputs stay sharded) plus the psum'd global match count.  step(
    words (n_dev, W), ends (n_dev, R), n_true (n_dev,), matrix (4, w),
    threshold) -> (positions (n_dev, cap) int32, n_matches (n_dev,)
    int32, total scalar)."""
    key = ("pwm", mesh, window_size, cap)
    if key in _FOLD_STEP_CACHE:
        return _FOLD_STEP_CACHE[key]
    from ..ops.pwm import pwm_match_compact, pwm_scores_packed

    import inspect
    params = inspect.signature(shard_map).parameters
    check_kw = {"check_vma": False} if "check_vma" in params else \
        {"check_rep": False}

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P("dp"), P(), P()),
             out_specs=(P("dp", None), P("dp"), P()), **check_kw)
    def step(words_b, ends_b, n_true_b, matrix, threshold):
        scores = pwm_scores_packed(words_b[0], matrix, window_size)
        pos, n_matches = pwm_match_compact(scores, ends_b[0],
                                           n_true_b[0], threshold,
                                           window_size, cap)
        total = jax.lax.psum(n_matches, "dp")
        return (pos[None], n_matches.astype(jnp.int32)[None],
                total.astype(jnp.int32))

    jitted = jax.jit(step)
    _FOLD_STEP_CACHE[key] = jitted
    return jitted


def shard_packed_reads(flat_codes: np.ndarray, lengths: np.ndarray,
                       n_shards: int, min_bucket: int = 1 << 10):
    """Host-side: split a ragged chunk on row boundaries into n_shards
    equal-bucket PACKED shards.  Returns (words (n, W+2) uint32,
    ends (n, R) int32, n_true (n,) int32) ready for a P('dp', ...)
    sharding — the packed twin of kmer_parallel.shard_flat_codes."""
    from ..native import pack_2bit_fill
    from ..ops.device import bucket_size

    offsets = np.insert(np.cumsum(lengths, dtype=np.int64), 0, 0)
    targets = (np.arange(1, n_shards) * offsets[-1]) // n_shards
    split_rows = np.searchsorted(offsets, targets)
    row_bounds = np.concatenate([[0], split_rows, [len(lengths)]])
    base_lens = [int(offsets[row_bounds[i + 1]] - offsets[row_bounds[i]])
                 for i in range(n_shards)]
    bucket = bucket_size(max(max(base_lens), 1), min_bucket)
    n_words = bucket // WORD_BASES + 2
    max_rows = max(int(row_bounds[i + 1] - row_bounds[i])
                   for i in range(n_shards))
    rows_bucket = bucket_size(max(max_rows, 1), 16)
    words = np.zeros((n_shards, n_words), dtype=np.uint32)
    ends = np.zeros((n_shards, rows_bucket), dtype=np.int32)
    n_true = np.zeros(n_shards, dtype=np.int32)
    for i in range(n_shards):
        a, b = int(row_bounds[i]), int(row_bounds[i + 1])
        part = flat_codes[offsets[a]: offsets[b]]
        words[i] = pack_2bit_fill(part, n_words * 4).view(np.uint32)
        e = np.cumsum(lengths[a:b], dtype=np.int64).astype(np.int32)
        ends[i, : len(e)] = e
        ends[i, len(e):] = e[-1] if len(e) else 0
        n_true[i] = len(part)
    return words, ends, n_true


def host_merge_check(flat_codes: np.ndarray, lengths: np.ndarray, k: int):
    """Independent host recompute of the sparse counts (for tests and
    the multi-chip dryrun verification)."""
    codes = flat_codes.astype(np.uint64)
    ends = np.cumsum(lengths)
    dist = np.repeat(ends, lengths) - np.arange(len(codes))
    hashes = np.zeros(len(codes), dtype=np.uint64)
    for j in range(k):
        idx = np.arange(len(codes) - j)
        hashes[idx] |= codes[idx + j] << np.uint64(2 * j)
    valid = dist >= k
    return np.unique(hashes[valid], return_counts=True)
