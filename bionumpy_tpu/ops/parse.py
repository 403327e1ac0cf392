"""Device-resident FASTQ parsing: the newline scan, field-span
extraction and encoding run under jit on TPU; only raw file bytes cross
the host->device link.

This is the device twin of the host parser (bionumpy_tpu/io): the jitted
scan produces static-shape line-span arrays (jnp.flatnonzero with a
static `size` + fill), so one compiled program serves every chunk of the
same bucket size.  Composed with the rolling-hash kernel it gives the
fully device-resident bytes->kmer-counts pipeline of the north star.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEWLINE = 10


@partial(jax.jit, static_argnames=("max_lines",))
def fastq_scan(raw: jnp.ndarray, n_true: jnp.ndarray, max_lines: int):
    """Scan raw FASTQ bytes (padded, uint8) into per-line spans.

    Returns (line_starts, line_ends, n_lines, ok) where the arrays have
    static length `max_lines` (filled with n_true beyond the real lines)
    and ok verifies the '@'/'+' structure of every complete entry."""
    n = raw.shape[0]
    positions = jnp.arange(n)
    is_nl = (raw == NEWLINE) & (positions < n_true)
    line_ends = jnp.flatnonzero(is_nl, size=max_lines, fill_value=n)
    line_starts = jnp.concatenate([jnp.zeros(1, line_ends.dtype),
                                   line_ends[:-1] + 1])
    n_lines = is_nl.sum()
    line_idx = jnp.arange(max_lines)
    real = line_idx < n_lines
    # entry structure: line 4i starts with '@', line 4i+2 with '+'
    first_byte = raw[jnp.minimum(line_starts, n - 1)]
    is_header_line = (line_idx % 4 == 0) & real
    is_plus_line = (line_idx % 4 == 2) & real
    ok = jnp.all(jnp.where(is_header_line, first_byte == ord("@"), True)) \
        & jnp.all(jnp.where(is_plus_line, first_byte == ord("+"), True))
    return line_starts, line_ends, n_lines, ok


@partial(jax.jit, static_argnames=("max_lines", "k", "n_counts"))
def fastq_to_kmer_counts(raw: jnp.ndarray, encode_lut: jnp.ndarray,
                         n_true: jnp.ndarray, max_lines: int, k: int,
                         n_counts: int):
    """Raw FASTQ bytes -> (kmer counts over 4^k, composition over 4,
    n_entries, ok): everything on device.

    Sequence-line spans become a validity mask via boundary scatters
    (start +1 at seq_start, -1 at max(seq_end-k+1, seq_start)); the
    rolling hash runs over the LUT-encoded raw buffer, masked to
    in-sequence windows."""
    from .kmers import kmer_hash_limbs

    n = raw.shape[0]
    line_starts, line_ends, n_lines, ok = fastq_scan(raw, n_true,
                                                     max_lines)
    n_entries = n_lines // 4
    max_entries = max_lines // 4
    entry_idx = jnp.arange(max_entries)
    real_entry = entry_idx < n_entries
    seq_starts = jnp.where(real_entry, line_starts[1::4], n)
    seq_ends = jnp.where(real_entry, line_ends[1::4], n)

    # encode every byte; invalid bytes (headers, quality, N) map to 0
    # and are excluded below
    raw_codes = jnp.take(encode_lut, raw.astype(jnp.int32))
    invalid_byte = raw_codes == 255
    codes = jnp.where(invalid_byte, 0, raw_codes)
    # hash every position (padded halo of 32 is part of the bucket)
    lo, _ = kmer_hash_limbs(
        jnp.concatenate([codes, jnp.zeros(32, codes.dtype)]), k)
    lo = lo[:n]

    # window-validity from spans
    marks = jnp.zeros(n + 1, jnp.int32)
    marks = marks.at[seq_starts].add(1)
    window_ends = jnp.maximum(seq_ends - (k - 1), seq_starts)
    marks = marks.at[window_ends].add(-1)
    valid = jnp.cumsum(marks[:-1]) > 0
    # drop windows containing a non-ACGT byte inside a sequence span
    base_marks0 = jnp.zeros(n + 1, jnp.int32)
    base_marks0 = base_marks0.at[seq_starts].add(1)
    base_marks0 = base_marks0.at[seq_ends].add(-1)
    in_seq0 = jnp.cumsum(base_marks0[:-1]) > 0
    bad_base = invalid_byte & in_seq0
    bad_cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(bad_base.astype(jnp.int32))])
    window_bad = (bad_cum[jnp.minimum(jnp.arange(n) + k, n)] -
                  bad_cum[: n]) > 0
    valid = valid & ~window_bad

    indices = jnp.where(valid, lo.astype(jnp.int32), n_counts)
    counts = jnp.zeros(n_counts + 1, jnp.int32).at[indices].add(1)[:-1]

    comp_idx = jnp.where(in_seq0 & ~invalid_byte,
                         codes.astype(jnp.int32), 4)
    composition = jnp.zeros(5, jnp.int32).at[comp_idx].add(1)[:-1]
    return counts, composition, n_entries, ok


@partial(jax.jit, static_argnames=("max_lines", "k", "cap"))
def fastq_to_sparse_kmer_table(raw: jnp.ndarray, encode_lut: jnp.ndarray,
                               n_true: jnp.ndarray, max_lines: int,
                               k: int, cap: int):
    """Raw FASTQ bytes -> compacted sparse (hash, count) table, all on
    device: scan + encode + rolling hash + sort/compact in ONE program.

    The low-H2D alternative of the streamed pipeline (call stack fusion
    goal: bionumpy/io/one_line_buffer.py:36-71 ->
    bionumpy/sequence/kmers.py:106-128 as one program): ships raw bytes
    (1 B/base incl. headers/quality) instead of packed words + row ends,
    trading link bytes for zero host parse work — chosen automatically
    by pipeline.count_kmers_fastq when the host parser, not the link, is
    the bottleneck.

    Returns (table (3, cap) uint32 [lo, hi, run_start],
             meta (4,) int32 [n_unique, n_valid, n_entries, ok])."""
    from .kmers import kmer_hash_limbs, sorted_runs_from_limbs

    n = raw.shape[0]
    line_starts, line_ends, n_lines, ok = fastq_scan(raw, n_true,
                                                     max_lines)
    ok = ok & (n_lines < max_lines) & (n_lines % 4 == 0)
    n_entries = n_lines // 4
    max_entries = max_lines // 4
    entry_idx = jnp.arange(max_entries)
    real_entry = entry_idx < n_entries
    seq_starts = jnp.where(real_entry, line_starts[1::4], n)
    seq_ends = jnp.where(real_entry, line_ends[1::4], n)

    raw_codes = jnp.take(encode_lut, raw.astype(jnp.int32))
    invalid_byte = raw_codes == 255
    codes = jnp.where(invalid_byte, 0, raw_codes)
    lo, hi = kmer_hash_limbs(
        jnp.concatenate([codes, jnp.zeros(2 * 16, codes.dtype)]), k)
    lo, hi = lo[:n], hi[:n]

    marks = jnp.zeros(n + 1, jnp.int32)
    marks = marks.at[seq_starts].add(1)
    marks = marks.at[jnp.maximum(seq_ends - (k - 1), seq_starts)].add(-1)
    valid = jnp.cumsum(marks[:-1]) > 0
    # drop windows containing a non-ACGT byte inside a sequence span
    base_marks = jnp.zeros(n + 1, jnp.int32)
    base_marks = base_marks.at[seq_starts].add(1)
    base_marks = base_marks.at[seq_ends].add(-1)
    in_seq = jnp.cumsum(base_marks[:-1]) > 0
    bad = invalid_byte & in_seq
    # a non-ACGT byte inside a sequence is a hard error, matching the
    # host parser (native.fastq_parse_pack raises ValueError) — without
    # this the two transports would return different counts on
    # N-containing input instead of failing loudly (ADVICE r2)
    ok = ok & ~bad.any()
    bad_cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(bad.astype(jnp.int32))])
    window_bad = (bad_cum[jnp.minimum(jnp.arange(n) + k, n)] -
                  bad_cum[:n]) > 0
    valid = valid & ~window_bad

    uniq_lo, uniq_hi, run_starts, n_unique, n_valid = \
        sorted_runs_from_limbs(lo, hi, valid, min(cap, n))
    from .kmers import counts_from_runs
    cnt = counts_from_runs(run_starts, n_unique, n_valid,
                           run_starts.shape[0])
    slot_ok = jnp.arange(run_starts.shape[0], dtype=jnp.int32) < n_unique
    sentinel = jnp.uint32(0xFFFFFFFF)
    table = jnp.stack([jnp.where(slot_ok, uniq_lo, sentinel),
                       jnp.where(slot_ok, uniq_hi, sentinel),
                       cnt.astype(jnp.uint32)])
    n_bases_out = jnp.where(real_entry, seq_ends - seq_starts, 0).sum()
    meta = jnp.stack([n_unique.astype(jnp.int32),
                      n_valid.astype(jnp.int32),
                      n_entries.astype(jnp.int32),
                      ok.astype(jnp.int32),
                      n_bases_out.astype(jnp.int32)])
    return table, meta


def parse_fastq_chunk_on_device(raw_bytes: np.ndarray, k: int = 5,
                                min_bucket: int = 1 << 14):
    """Host wrapper: pad raw bytes into a bucket and run the device
    pipeline.  Returns (counts, composition, n_entries)."""
    from ..encodings import DNAEncoding
    from .device import bucket_size

    n = len(raw_bytes)
    size = bucket_size(max(n, 1), min_bucket)
    padded = np.zeros(size, dtype=np.uint8)
    padded[:n] = raw_bytes
    max_lines = size // 2  # '+\n' lines are 2 bytes, the shortest line
    counts, comp, n_entries, ok = fastq_to_kmer_counts(
        jnp.asarray(padded), jnp.asarray(DNAEncoding.lookup_table),
        jnp.asarray(n, dtype=jnp.int32), max_lines, k, 4 ** k)
    if not bool(np.asarray(ok)):
        raise ValueError("malformed FASTQ chunk (device scan)")
    return (np.asarray(counts), np.asarray(comp),
            int(np.asarray(n_entries)))
