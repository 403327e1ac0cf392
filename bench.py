"""Benchmark: end-to-end 31-mer COUNTING of a big.fq.gz-scale FASTQ.

Whole-job timing, file-in to counts-out, matching the reference's own
benchmark protocol (gzip + parse + count as ONE job with output
validation: /root/reference/benchmarks/config.yml:79-90,
benchmarks/rules/kmer_counting.smk:8-16, validate_equal: true):

  read -> parallel multi-member gzip inflate -> fused native parse+pack
  -> H2D (packed 2-bit words) -> device sort/compact sparse count
  -> D2H compacted tables -> host merge

The timed loop produces the full exact (kmer, count) table each
iteration and the result is checked against an independent single-core
numpy recomputation (the reference BitArray algorithm + np.unique).
vs_baseline is the speedup over that numpy implementation doing the
same whole job (inflate + parse + hash + unique count) single-core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time
import zlib

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/bionumpy_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

K = 31
REPLICATION = 512   # 512 gzip members x 1000 reads = 111.4M bases/job
WARMUP_ITERS = 1
TIMED_ITERS = 3
BASELINE_MEMBERS = 8  # numpy baseline measures this many, scales up
FASTQ = "/root/reference/example_data/big.fq.gz"
BENCH_FILE = "/tmp/bionumpy_bench_big512.fq.gz"


def numpy_reference_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Single-core numpy twin of the reference's 2-bit-pack rolling hash
    (npstructures BitArray.pack/sliding_window as used at
    /root/reference/bionumpy/sequence/kmers.py:106-128)."""
    codes = codes.astype(np.uint64)
    n = len(codes)
    n_words = (n + 31) // 32 + 2
    padded = np.zeros(n_words * 32, dtype=np.uint64)
    padded[:n] = codes
    blocks = padded.reshape(-1, 32)
    shifts = (2 * np.arange(32, dtype=np.uint64))
    words = np.bitwise_or.reduce(blocks << shifts, axis=-1)
    i = np.arange(n, dtype=np.int64)
    w = i >> 5
    bit = ((i & 31) << 1).astype(np.uint64)
    p0 = words[w]
    p1 = words[w + 1]
    lo = (p0 >> bit) | np.where(bit == np.uint64(0), np.uint64(0),
                                p1 << (np.uint64(64) - bit))
    mask = np.uint64((1 << (2 * k)) - 1)
    return lo & mask


def numpy_parse_fastq(raw: np.ndarray):
    """Single-core numpy FASTQ parse -> (flat DNA codes, lengths): the
    reference's layered newline-scan/field-gather/encode approach
    (bionumpy/io/one_line_buffer.py:36-71 + encode LUT)."""
    nl = np.flatnonzero(raw == 10)
    starts = np.insert(nl[:-1] + 1, 0, 0)
    s_starts = starts[1::4]
    s_lens = (nl[1::4] - s_starts).astype(np.int64)
    idx = np.repeat(s_starts - np.insert(np.cumsum(s_lens)[:-1], 0, 0),
                    s_lens) + np.arange(int(s_lens.sum()), dtype=np.int64)
    enc = np.full(256, 255, np.uint8)
    for i, c in enumerate("ACGT"):
        enc[ord(c)] = i
        enc[ord(c.lower())] = i
    return enc[raw[idx]], s_lens


def numpy_whole_job(members, k):
    """The baseline whole job: inflate + parse + hash + unique-count."""
    tables = []
    for comp in members:
        raw = np.frombuffer(zlib.decompress(comp, wbits=31), np.uint8)
        codes, lengths = numpy_parse_fastq(raw)
        hashes = numpy_reference_hashes(codes, k)
        ends = np.cumsum(lengths)
        dist = np.repeat(ends, lengths) - np.arange(len(codes))
        h, c = np.unique(hashes[dist >= k], return_counts=True)
        tables.append((h, c))
    all_h = np.concatenate([t[0] for t in tables])
    all_c = np.concatenate([t[1] for t in tables])
    order = np.argsort(all_h, kind="stable")
    all_h, all_c = all_h[order], all_c[order]
    keep = np.flatnonzero(np.concatenate(
        [[True], all_h[1:] != all_h[:-1]]))
    return all_h[keep], np.add.reduceat(all_c, keep)


def main():
    member = open(FASTQ, "rb").read()
    if not os.path.exists(BENCH_FILE) or \
            os.path.getsize(BENCH_FILE) != len(member) * REPLICATION:
        with open(BENCH_FILE, "wb") as f:
            for _ in range(REPLICATION):
                f.write(member)

    import jax  # noqa: F401  (initialize backend before timing)
    from bionumpy_tpu import instrument
    from bionumpy_tpu.pipeline import count_kmers_fastq

    # --- timed end-to-end runs ----------------------------------------
    for _ in range(WARMUP_ITERS):
        counts, stats = count_kmers_fastq(BENCH_FILE, K)
    times = []
    for _ in range(TIMED_ITERS):
        instrument.reset()
        t0 = time.perf_counter()
        counts, stats = count_kmers_fastq(BENCH_FILE, K)
        # force a host-side consume (relay can return early otherwise)
        total = int(counts.counts.sum())
        times.append(time.perf_counter() - t0)
    t_job = min(times)
    split = instrument.summary(total=times[-1])

    n_kmers = stats["n_kmers"]
    assert total == n_kmers
    kmer_rate = n_kmers / t_job
    read_rate = stats["n_reads"] / t_job

    # --- exactness: independent single-core numpy recompute ------------
    exp_h, exp_c = numpy_whole_job([member], K)
    exact = (np.array_equal(counts.label_codes, exp_h) and
             np.array_equal(counts.counts, exp_c * REPLICATION))
    if not exact:
        print(json.dumps({"metric": "31-mer count exactness", "value": 0,
                          "unit": "bool", "vs_baseline": 0}))
        sys.exit(1)

    # --- single-core numpy baseline on the same whole job --------------
    # min-of-3: this host's cpu throttles in bursts; min is the honest
    # (baseline-favoring) steady-state rate, same policy as t_job
    base_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        numpy_whole_job([member] * BASELINE_MEMBERS, K)
        base_times.append(time.perf_counter() - t0)
    t_base = min(base_times) * (REPLICATION / BASELINE_MEMBERS)

    print(json.dumps({
        "metric": "end-to-end 31-mer counting, gzip FASTQ file-in to "
                  f"exact counts-out ({stats['n_reads']} reads, "
                  f"{stats['n_bases'] / 1e6:.0f} Mbases, "
                  f"{read_rate:.0f} reads/s; split: {split}; numpy "
                  f"1-core {t_base:.1f}s)",
        "value": round(kmer_rate / 1e6, 2),
        "unit": "Mkmers/s",
        "vs_baseline": round(t_base / t_job, 2),
    }))


if __name__ == "__main__":
    main()
