"""Measure the two-key-sort count path vs the radix-partition prototype
on a real 2^25-position batch (VERDICT r2 item 9).  Run ALONE on the
TPU: python benchmarks/radix_vs_sort.py"""
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

    from bionumpy_tpu.ops.kmers import (kmer_sentinel_table_packed,
                                        _window_limbs)
    from bionumpy_tpu.ops.radix_count import radix_sorted_runs
    from bench import _diverse_members, _ensure_diverse_file
    import zlib
    from bench import numpy_parse_fastq
    from bionumpy_tpu.native import pack_2bit_fill

    member = open("/root/reference/example_data/big.fq.gz", "rb").read()
    _ensure_diverse_file(member)
    # one real batch: first 150 members of the diverse file
    members = _diverse_members()[:150]
    codes_list, lens_list = [], []
    for comp in members:
        raw = np.frombuffer(zlib.decompress(comp, wbits=31), np.uint8)
        c, l = numpy_parse_fastq(raw)
        codes_list.append(c)
        lens_list.append(l)
    codes = np.concatenate(codes_list)[: (1 << 25)]
    lengths = np.concatenate(lens_list)
    ends = np.cumsum(lengths).astype(np.int32)
    ends = ends[ends <= len(codes)]
    n = int(ends[-1])
    k, cap = 31, 1 << 21
    n_pos = 1 << 25
    words = pack_2bit_fill(codes[:n], n_pos // 4 + 8).view(np.uint32)
    dev = jax.devices()[0]
    words_d = jax.device_put(words, dev)
    ends_d = jax.device_put(ends, dev)
    print(f"batch: {n/1e6:.1f} Mbases, {len(ends)} reads", flush=True)

    def timeit(fn, label, iters=5):
        fn()  # compile
        best = 9e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            _ = int(np.asarray(out))  # force host consume
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:.1f} ms "
              f"({n_pos/best/1e6:.0f} Mpos/s)", flush=True)
        return best

    def sort_path():
        lo_t, hi_t, cnt, meta = kmer_sentinel_table_packed(
            words_d, ends_d, k, n, cap)
        return meta[0]

    t_sort = timeit(sort_path, "two-key sort + compaction")

    # radix path on the same limbs (shares hashing + validity with the
    # sort path via _window_limbs)
    import functools

    @functools.partial(jax.jit, static_argnames=("k", "nb", "bc", "cap"))
    def radix_full(words, ends, n_true, k, nb, bc, cap):
        lo, hi = _window_limbs(words, n_pos, k)
        marks = jnp.zeros(n_pos + 1, jnp.int32)
        marks = marks.at[jnp.maximum(ends - (k - 1), 0)].add(1)
        marks = marks.at[ends].add(-1)
        invalid = jnp.cumsum(marks[:-1])
        pos = jnp.arange(n_pos, dtype=jnp.int32)
        valid = (invalid == 0) & (pos < jnp.minimum(ends[-1], n_true))
        out = radix_sorted_runs(lo, hi, valid, k, nb, bc, cap)
        return out[3]

    for nb, bc in ((256, (1 << 25) // 256 * 2), (1024, (1 << 25) // 1024 * 2)):
        def radix_path(nb=nb, bc=bc):
            return radix_full(words_d, ends_d, n, k, nb, bc, cap)
        timeit(radix_path, f"radix partition nb={nb} bc={bc}")


if __name__ == "__main__":
    main()
