// Native host kernels for bionumpy_tpu.
//
// The reference is pure Python (SURVEY: no native code exists there); the
// TPU build adds native host helpers only where work is inherently
// sequential or branchy and feeds the device pipeline:
//  - BAM record framing: start' = start + 4 + block_len(start)
//    (reference does this with a Python int.from_bytes loop,
//    bionumpy/io/bam.py:296-313)
//  - 2-bit packing of DNA codes for minimal-byte H2D uploads.
// Built with: g++ -O3 -shared -fPIC -o _host_kernels.so host_kernels.cpp
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Returns the number of record starts written to `starts` (capacity
// `max_starts`).  Follows the BAM block-length chain until the next start
// would exceed `n`.  Returns -1 on corrupt (non-advancing) block length.
long bam_find_starts(const uint8_t* chunk, long n, long* starts,
                     long max_starts) {
    long count = 0;
    long pos = 0;
    if (max_starts > 0) {
        starts[count++] = 0;
    }
    while (pos + 4 <= n && count < max_starts) {
        uint32_t block;
        std::memcpy(&block, chunk + pos, 4);  // BAM is little-endian
        long next = pos + 4 + (long)block;
        if (next <= pos) {
            return -1;
        }
        if (next > n) {
            break;
        }
        starts[count++] = next;
        pos = next;
    }
    // one past the end if the final record ends exactly at n is already
    // handled: starts always begin at 0 and include every reachable start
    // <= n
    return count;
}

// Pack 4 codes/byte for out_bytes output bytes starting at code index
// 4*byte_off.  64-bit gather trick: for 8 codes loaded as one uint64,
// t = x | x>>6 packs adjacent pairs into bytes 0/2/4/6, u = t | t>>12
// packs nibble-pairs so bytes 0 and 4 of u are the two output bytes.
static void pack_2bit_range(const uint8_t* codes, long byte_off,
                            long out_bytes, uint8_t* out) {
    const uint8_t* c = codes + 4 * byte_off;
    uint8_t* o = out + byte_off;
    long i = 0;
    for (; i + 2 <= out_bytes; i += 2) {
        uint64_t x;
        std::memcpy(&x, c + 4 * i, 8);
        uint64_t t = x | (x >> 6);
        uint64_t u = t | (t >> 12);
        o[i] = (uint8_t)u;
        o[i + 1] = (uint8_t)(u >> 32);
    }
    for (; i < out_bytes; ++i) {
        const uint8_t* p = c + 4 * i;
        o[i] = (uint8_t)(p[0] | (p[1] << 2) | (p[2] << 4) | (p[3] << 6));
    }
}

// Pack 2-bit codes (values 0..3) into bytes, 4 codes per byte,
// little-endian within the byte.  n must be a multiple of 4.
void pack_2bit(const uint8_t* codes, long n, uint8_t* out) {
    pack_2bit_range(codes, 0, n / 4, out);
}

// Pack n codes into out[0:out_bytes], zero-filling everything past the
// packed prefix (so callers need no pre-padded copy of the codes).
// Multithreaded over the packed prefix.
void pack_2bit_fill(const uint8_t* codes, long n, uint8_t* out,
                    long out_bytes, int n_threads) {
    long full_bytes = n / 4;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 1 && full_bytes > (1L << 16)) {
        std::vector<std::thread> workers;
        long per = (full_bytes + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; ++t) {
            long off = t * per;
            long len = off < full_bytes
                ? (off + per <= full_bytes ? per : full_bytes - off) : 0;
            if (len > 0)
                workers.emplace_back(pack_2bit_range, codes, off, len, out);
        }
        for (auto& w : workers) w.join();
    } else {
        pack_2bit_range(codes, 0, full_bytes, out);
    }
    long pos = full_bytes;
    if (n % 4) {  // trailing partial byte
        uint8_t b = 0;
        for (long j = 0; j < n % 4; ++j)
            b |= (uint8_t)(codes[4 * full_bytes + j] << (2 * j));
        out[pos++] = b;
    }
    if (pos < out_bytes)
        std::memset(out + pos, 0, out_bytes - pos);
}

// ---- k-mer row-end correction -------------------------------------------
//
// The device hot kernel sums hash limbs over ALL flat window positions
// (zero-padded windows hash to 0).  Windows that cross a row boundary are
// invalid under the reference's trim rule (bionumpy/sequence/rollable.py:
// 57-69); there are at most k-1 of them per row, ending at each row end.
// This kernel recomputes exactly those windows from the same 2-bit-packed
// buffer and returns their limb sums (mod 2^32) so the caller can subtract
// them from the device's unmasked sums — O(rows*k) host work fully
// overlapped with the device pass, instead of an O(n_positions) validity
// cumsum on device.

static void kmer_corr_range(const uint8_t* packed, long nbytes,
                            const int64_t* ends, const int64_t* starts,
                            long row_lo, long row_hi, int k,
                            uint32_t* lo_out, uint32_t* hi_out) {
    const uint64_t mask = (2 * k >= 64) ? ~0ull : ((1ull << (2 * k)) - 1);
    uint32_t lo = 0, hi = 0;
    for (long r = row_lo; r < row_hi; ++r) {
        int64_t e = ends[r];
        int64_t j0 = e - (k - 1);
        if (j0 < starts[r]) j0 = starts[r];
        for (int64_t j = j0; j < e; ++j) {
            long byte = (long)(j >> 2);
            int sh = (int)(j & 3) * 2;
            uint64_t w0 = 0, w1 = 0;
            if (byte + 16 <= nbytes) {
                std::memcpy(&w0, packed + byte, 8);
                std::memcpy(&w1, packed + byte + 8, 8);
            } else {  // zero-padded tail read
                uint8_t buf[16] = {0};
                long avail = nbytes - byte;
                if (avail > 16) avail = 16;
                if (avail > 0) std::memcpy(buf, packed + byte, (size_t)avail);
                std::memcpy(&w0, buf, 8);
                std::memcpy(&w1, buf + 8, 8);
            }
            uint64_t val = (w0 >> sh) | (sh ? (w1 << (64 - sh)) : 0);
            val &= mask;
            lo += (uint32_t)val;
            hi += (uint32_t)(val >> 32);
        }
    }
    *lo_out = lo;
    *hi_out = hi;
}

// out[0] += sum of lo limbs, out[1] += sum of hi limbs (mod 2^32) of all
// row-crossing windows.  packed: 2-bit codes, 4/byte little-endian.
void kmer_correction_sums(const uint8_t* packed, long nbytes,
                          const int64_t* ends, const int64_t* starts,
                          long n_rows, int k, int n_threads,
                          uint32_t* out) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads == 1 || n_rows < (1L << 12)) {
        kmer_corr_range(packed, nbytes, ends, starts, 0, n_rows, k,
                        out, out + 1);
        return;
    }
    std::vector<uint32_t> lo(n_threads), hi(n_threads);
    std::vector<std::thread> workers;
    long per = (n_rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        long a = t * per;
        long b = a + per < n_rows ? a + per : n_rows;
        if (a >= b) { lo[t] = hi[t] = 0; continue; }
        workers.emplace_back(kmer_corr_range, packed, nbytes, ends, starts,
                             a, b, k, &lo[t], &hi[t]);
    }
    for (auto& w : workers) w.join();
    uint32_t l = 0, h = 0;
    for (int t = 0; t < n_threads; ++t) { l += lo[t]; h += hi[t]; }
    out[0] = l;
    out[1] = h;
}

}  // extern "C"
