"""Probe the headline pipeline's final-phase split: device tail vs
actual D2H transfer bandwidth, plus per-batch device count time.
Run ALONE on the TPU: python benchmarks/probe_d2h.py"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import _ensure_diverse_file, DIVERSE_FILE
    from bionumpy_tpu.pipeline import (_device_merge_fns, _sentinel_table,
                                       count_kmers_fastq)

    member = open("/root/reference/example_data/big.fq.gz", "rb").read()
    _ensure_diverse_file(member)
    dev = jax.devices()[0]

    # 1. run the pipeline once to warm compiles
    counts, stats = count_kmers_fastq(DIVERSE_FILE, 31, cap=1 << 21,
                                      device_parse=False)
    print(f"warm job done: {stats}", flush=True)

    # 2. D2H bandwidth probe: fetch a 3.15M x 3 uint32 slab 5 times
    acc_cap = 1 << 23
    _, make_acc, _ = _device_merge_fns()
    with jax.default_device(dev):
        acc = make_acc(acc_cap)
        acc.block_until_ready()
    n_fetch = 3 * (1 << 20)
    for trial in range(5):
        t0 = time.perf_counter()
        t = np.asarray(acc[:, :n_fetch])
        dt = time.perf_counter() - t0
        mb = t.nbytes / 1e6
        print(f"D2H slab {mb:.1f} MB: {dt*1e3:.0f} ms "
              f"({mb/dt:.0f} MB/s)", flush=True)

    # 3. fold program timing: 8 sentinel tables into the acc
    fold_program, make_acc, _ = _device_merge_fns()
    cap = 1 << 21
    tables = tuple(_sentinel_table(cap, dev) for _ in range(8))
    with jax.default_device(dev):
        acc = make_acc(acc_cap)
    acc, nu = fold_program(acc, tables, acc_cap)  # compile
    jax.block_until_ready(acc)
    for trial in range(3):
        with jax.default_device(dev):
            acc = make_acc(acc_cap)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        acc, nu = fold_program(acc, tables, acc_cap)
        _ = int(np.asarray(nu))
        print(f"fold(8x2^21 + 2^23 acc): "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    # 4. per-batch count timing on a real batch
    from bench import _diverse_members, numpy_parse_fastq
    import zlib
    from bionumpy_tpu.native import fastq_parse_pack
    from bionumpy_tpu.ops.kmers import kmer_sentinel_table_packed, WORD_BASES
    from bionumpy_tpu.ops.device import bucket_size
    members = _diverse_members()[:150]
    raws = b"".join(zlib.decompress(c, wbits=31) for c in members)
    arr = np.frombuffer(raws, np.uint8)
    packed, lengths, n_bases = fastq_parse_pack(arr,
                                                out_bytes=len(arr) // 8 + 16)
    n_bases = min(n_bases, 1 << 25)
    bucket = bucket_size(n_bases, 1 << 14)
    out = np.zeros(bucket // 4 + 2 * (WORD_BASES // 4), np.uint8)
    out[: (n_bases + 3) // 4] = packed[: (n_bases + 3) // 4]
    ends = np.cumsum(lengths, dtype=np.int64).astype(np.int32)
    ends = ends[ends <= n_bases]
    rb = bucket_size(len(ends), 4096)
    ends = np.concatenate([ends, np.full(rb - len(ends), ends[-1],
                                         np.int32)])
    words_d = jax.device_put(out.view(np.uint32), dev)
    ends_d = jax.device_put(ends, dev)
    lo_t, hi_t, cnt, meta = kmer_sentinel_table_packed(
        words_d, ends_d, 31, n_bases, 1 << 21)
    _ = np.asarray(meta)
    for trial in range(3):
        t0 = time.perf_counter()
        lo_t, hi_t, cnt, meta = kmer_sentinel_table_packed(
            words_d, ends_d, 31, n_bases, 1 << 21)
        m = np.asarray(meta)
        print(f"batch count 2^25 pos: "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms "
              f"(distinct={int(m[0])})", flush=True)


if __name__ == "__main__":
    main()
