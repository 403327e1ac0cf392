import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, zlib

def main():
    import jax
    from bench import _diverse_members, numpy_parse_fastq, _ensure_diverse_file
    from bionumpy_tpu.native import fastq_parse_pack
    from bionumpy_tpu.ops.kmers import kmer_sentinel_table_packed, WORD_BASES
    from bionumpy_tpu.ops.device import bucket_size
    member = open("/root/reference/example_data/big.fq.gz","rb").read()
    _ensure_diverse_file(member)
    members = _diverse_members()[:320]
    raws = b"".join(zlib.decompress(c, wbits=31) for c in members)
    arr = np.frombuffer(raws, np.uint8)
    packed, lengths, n_bases = fastq_parse_pack(arr, out_bytes=len(arr)//8+16)
    dev = jax.devices()[0]
    for P in (1<<25, 1<<26):
        n = min(n_bases, P)
        out = np.zeros(P//4 + 2*(WORD_BASES//4), np.uint8)
        out[:(n+3)//4] = packed[:(n+3)//4]
        ends = np.cumsum(lengths, dtype=np.int64).astype(np.int32)
        ends = ends[ends <= n]
        rb = bucket_size(len(ends), 4096)
        ends = np.concatenate([ends, np.full(rb-len(ends), ends[-1], np.int32)])
        words_d = jax.device_put(out.view(np.uint32), dev)
        ends_d = jax.device_put(ends, dev)
        cap = (1<<21) if P == (1<<25) else (1<<22)
        lo_t, hi_t, cnt, meta = kmer_sentinel_table_packed(words_d, ends_d, 31, n, cap)
        _ = np.asarray(meta)
        best = 9e9
        for _ in range(5):
            t0 = time.perf_counter()
            lo_t, hi_t, cnt, meta = kmer_sentinel_table_packed(words_d, ends_d, 31, n, cap)
            m = np.asarray(meta)
            best = min(best, time.perf_counter()-t0)
        print(f"count 2^{P.bit_length()-1} pos cap=2^{cap.bit_length()-1}: {best*1e3:.0f} ms ({P/best/1e6:.0f} Mpos/s, distinct={int(m[0])})", flush=True)

main()
