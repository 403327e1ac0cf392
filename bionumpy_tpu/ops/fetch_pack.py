"""Delta-compressed D2H transport for sorted (hash, count) tables.

The flagship pipeline's final output is a sorted table of ~millions of
62-bit k-mer hashes + counts; fetched raw that is 12 B/row over a link
whose D2H troughs at ~20 MB/s (the dominant cost of the whole job).
Sorted uniform hashes compress well: consecutive deltas of n draws from
a 2^62 space are ~2^62/n (≈2^40 at n=3M), so a fixed 48-bit delta plus
a 16-bit count covers essentially every row in 8 B — a 33% cut of the
final transfer with zero information loss.

Device side (`pack_sorted_table`): one jitted pass computes 64-bit
deltas with limb borrow arithmetic (TPU has no int64) and packs
    word0 = delta_lo (bits 0..31)
    word1 = delta_hi (bits 32..47) | count << 16
Row 0's "delta" is its full hash (prev = 0), which fits the same 48-bit
budget for any realistically dense table (the smallest of n uniform
62-bit hashes is ~2^62/n < 2^48 whenever n > 2^14).  Rows that don't
fit (delta >= 2^48 or count >= 2^16) are exceptions: their full
(idx, lo, hi, cnt) rows are compacted to the front of a small pinned
side block with the stable re-sort idiom, and that block is PREPENDED
to the packed stream so host fetches remain ONE prefix-sliced transfer.
With uniform hashes the expected exception count is ~0
(P[delta >= 2^48] at gap ~2^40 is exp(-256)); if the data defeats the
bound (n_exc > EXC_CAP) the caller falls back to the raw 12 B/row
fetch.

Host side (`unpack_sorted_table`): vectorized modular cumsum + a
segment-offset patch for the exceptions — exact mod 2^64, no loops
over rows.

(reference analog: none — the reference returns in-memory numpy arrays;
this exists because the TPU host link is the bottleneck the reference
never has.)
"""
from __future__ import annotations

import jax
import numpy as np

EXC_CAP = 4096            # exception rows the pinned side block holds
HEAD = 2 * (EXC_CAP + 1)  # packed-stream columns the side block uses


@jax.jit
def pack_sorted_table(acc, nu):
    """Pack a (3, n) uint32 [lo, hi, cnt] sorted-hash table for fetch.

    `nu` (device int32 scalar) is the number of live rows; rows past it
    are sentinel padding and are ignored.  Returns ONE (2, HEAD + n)
    uint32 array: columns [0, HEAD) hold the exception block (a
    (4, EXC_CAP + 1) table reshaped; its column 0 is [n_exc, nu, 0, 0],
    columns 1.. are compacted (idx, lo, hi, cnt) exception rows), and
    columns [HEAD, HEAD + n) hold the delta stream
    delta_lo / (delta_hi16 | count16 << 16).  The host fetches
    [:, : HEAD + nu] (quantum-rounded) as a single transfer.
    """
    import jax.numpy as jnp

    lo, hi, cnt = acc[0], acc[1], acc[2]
    n = lo.shape[0]
    prev_lo = jnp.concatenate([jnp.zeros(1, jnp.uint32), lo[:-1]])
    prev_hi = jnp.concatenate([jnp.zeros(1, jnp.uint32), hi[:-1]])
    borrow = (lo < prev_lo).astype(jnp.uint32)
    d_lo = lo - prev_lo
    d_hi = hi - prev_hi - borrow
    row = jnp.arange(n, dtype=jnp.int32)
    live = row < nu
    is_exc = live & ((d_hi >= jnp.uint32(1 << 16))
                     | (cnt >= jnp.uint32(1 << 16)))
    packed = jnp.stack([
        d_lo,
        (d_hi & jnp.uint32(0xFFFF)) | (cnt << jnp.uint32(16))])

    # compact exception indices to the front (stable re-sort idiom)
    _, p2 = jax.lax.sort(((~is_exc).astype(jnp.uint32), row),
                         num_keys=1, is_stable=True)
    m = min(EXC_CAP, n)
    idx = p2[:m]
    n_exc = is_exc.sum()
    exc_live = jnp.arange(m, dtype=jnp.int32) < n_exc
    z = jnp.uint32(0)
    exc_rows = jnp.stack([
        jnp.where(exc_live, idx.astype(jnp.uint32), z),
        jnp.where(exc_live, jnp.take(lo, idx), z),
        jnp.where(exc_live, jnp.take(hi, idx), z),
        jnp.where(exc_live, jnp.take(cnt, idx), z)])
    head = jnp.stack([n_exc.astype(jnp.uint32),
                      nu.astype(jnp.uint32), z, z])[:, None]
    exc = jnp.concatenate([head, exc_rows], axis=1)
    if m < EXC_CAP:  # tiny tables: pad the block to its pinned width
        exc = jnp.concatenate(
            [exc, jnp.zeros((4, EXC_CAP - m), jnp.uint32)], axis=1)
    return jnp.concatenate([exc.reshape(2, HEAD), packed], axis=1)


@jax.jit
def pack_runs_table(table, n_unique, n_valid):
    """pack_sorted_table for a (3, cap) [lo, hi, run_start] table (the
    kmer/minimizer count cores' native output): converts run starts to
    per-run counts on device, then delta-packs — so the host fetch of a
    distinct-value count table costs 8 B/row instead of 12."""
    import jax.numpy as jnp

    from .kmers import counts_from_runs
    cap = table.shape[1]
    cnt = counts_from_runs(table[2].astype(jnp.int32), n_unique,
                           n_valid, cap)
    acc = jnp.stack([table[0], table[1], cnt.astype(jnp.uint32)])
    return pack_sorted_table(acc, n_unique)


# 32-bit row variant: 24-bit delta + 8-bit count in ONE uint32 word.
# Minimizer tables want this: their hashes are windowed MINIMA, so the
# distinct set is min-biased with a heavy delta tail (measured config-3
# table: 26k rows with delta >= 2^24, 4.8k with count >= 256) — the
# exception block is sized 2^16 rows to absorb that and the stream
# halves the 8 B/row fetch.
EXC_CAP32 = 1 << 16
HEAD32 = 4 * (EXC_CAP32 + 1)  # uint32 words the side block occupies


@jax.jit
def pack_sorted_table32(acc, nu):
    """pack_sorted_table at 4 B/row: returns ONE 1-D uint32 array
    [exception block (4*(EXC_CAP32+1) words: word0..3 =
    [n_exc, nu, 0, 0], then (idx, lo, hi, cnt) quadruples compacted to
    the front), then the delta stream d_lo24 | count8 << 24].  Host
    fetches [: HEAD32 + nu] (quantum-rounded) as one transfer."""
    import jax.numpy as jnp

    lo, hi, cnt = acc[0], acc[1], acc[2]
    n = lo.shape[0]
    prev_lo = jnp.concatenate([jnp.zeros(1, jnp.uint32), lo[:-1]])
    prev_hi = jnp.concatenate([jnp.zeros(1, jnp.uint32), hi[:-1]])
    borrow = (lo < prev_lo).astype(jnp.uint32)
    d_lo = lo - prev_lo
    d_hi = hi - prev_hi - borrow
    row = jnp.arange(n, dtype=jnp.int32)
    live = row < nu
    is_exc = live & ((d_hi != 0) | (d_lo >= jnp.uint32(1 << 24))
                     | (cnt >= jnp.uint32(1 << 8)))
    packed = (d_lo & jnp.uint32(0xFFFFFF)) | (cnt << jnp.uint32(24))

    _, p2 = jax.lax.sort(((~is_exc).astype(jnp.uint32), row),
                         num_keys=1, is_stable=True)
    m = min(EXC_CAP32, n)
    idx = p2[:m]
    n_exc = is_exc.sum()
    exc_live = jnp.arange(m, dtype=jnp.int32) < n_exc
    z = jnp.uint32(0)
    exc_rows = jnp.stack([
        jnp.where(exc_live, idx.astype(jnp.uint32), z),
        jnp.where(exc_live, jnp.take(lo, idx), z),
        jnp.where(exc_live, jnp.take(hi, idx), z),
        jnp.where(exc_live, jnp.take(cnt, idx), z)], axis=1)
    if m < EXC_CAP32:
        exc_rows = jnp.concatenate(
            [exc_rows, jnp.zeros((EXC_CAP32 - m, 4), jnp.uint32)])
    head = jnp.stack([n_exc.astype(jnp.uint32),
                      nu.astype(jnp.uint32), z, z])[None]
    return jnp.concatenate([head.reshape(-1), exc_rows.reshape(-1),
                            packed])


@jax.jit
def pack_runs_table32(table, n_unique, n_valid):
    """pack_sorted_table32 for a (3, cap) [lo, hi, run_start] table."""
    import jax.numpy as jnp

    from .kmers import counts_from_runs
    cap = table.shape[1]
    cnt = counts_from_runs(table[2].astype(jnp.int32), n_unique,
                           n_valid, cap)
    acc = jnp.stack([table[0], table[1], cnt.astype(jnp.uint32)])
    return pack_sorted_table32(acc, n_unique)


def unpack_sorted_table32(slab: np.ndarray):
    """Host decode of a pack_sorted_table32 fetch (1-D uint32 prefix of
    >= HEAD32 + nu words).  Returns (hashes uint64 sorted, counts
    int64), or None if the exception block overflowed."""
    n_exc = int(slab[0])
    nu = int(slab[1])
    if n_exc > EXC_CAP32:
        return None
    if nu == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    w = slab[HEAD32: HEAD32 + nu]
    delta = (w & np.uint32(0xFFFFFF)).astype(np.uint64)
    counts = (w >> np.uint32(24)).astype(np.int64)
    if n_exc == 0:
        return np.cumsum(delta, dtype=np.uint64), counts
    exc = slab[4: 4 + 4 * n_exc].reshape(-1, 4)
    exc_idx = exc[:, 0].astype(np.int64)
    exc_hash = (exc[:, 1].astype(np.uint64)
                | (exc[:, 2].astype(np.uint64) << np.uint64(32)))
    exc_cnt = exc[:, 3].astype(np.int64)
    delta[exc_idx] = 0
    c = np.cumsum(delta, dtype=np.uint64)
    offsets = exc_hash - c[exc_idx]
    seg = np.zeros(nu, np.uint64)
    seg[exc_idx] = offsets - np.concatenate([[np.uint64(0)],
                                             offsets[:-1]])
    hashes = c + np.cumsum(seg, dtype=np.uint64)
    counts[exc_idx] = exc_cnt
    return hashes, counts


def unpack_sorted_table(slab: np.ndarray):
    """Host decode of a pack_sorted_table fetch.

    `slab` is the (2, >= HEAD + nu) uint32 prefix (extra columns are
    ignored).  Returns (hashes uint64 sorted, counts int64) of nu rows,
    or None if the exception block overflowed (caller falls back to a
    raw 12 B/row fetch).
    """
    exc = slab[:, :HEAD].reshape(4, EXC_CAP + 1)
    n_exc = int(exc[0, 0])
    nu = int(exc[1, 0])
    if n_exc > EXC_CAP:
        return None
    if nu == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    packed = slab[:, HEAD: HEAD + nu]
    d_lo = packed[0].astype(np.uint64)
    w1 = packed[1]
    delta = d_lo | ((w1 & np.uint64(0xFFFF)) << np.uint64(32))
    counts = (w1 >> np.uint16(16)).astype(np.int64)
    if n_exc == 0:
        return np.cumsum(delta, dtype=np.uint64), counts

    exc_idx = exc[0, 1: n_exc + 1].astype(np.int64)
    exc_hash = (exc[1, 1: n_exc + 1].astype(np.uint64)
                | (exc[2, 1: n_exc + 1].astype(np.uint64)
                   << np.uint64(32)))
    exc_cnt = exc[3, 1: n_exc + 1].astype(np.int64)

    # zero the garbage deltas at exception rows, cumsum, then add the
    # per-segment offset that pins each exception row to its full hash
    # (all arithmetic is exact mod 2^64)
    delta[exc_idx] = 0
    c = np.cumsum(delta, dtype=np.uint64)
    offsets = exc_hash - c[exc_idx]          # absolute offset/segment
    seg = np.zeros(nu, np.uint64)
    seg[exc_idx] = offsets - np.concatenate([[np.uint64(0)],
                                             offsets[:-1]])
    hashes = c + np.cumsum(seg, dtype=np.uint64)
    counts[exc_idx] = exc_cnt
    return hashes, counts
