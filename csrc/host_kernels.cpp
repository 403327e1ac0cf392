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

// Pack 2-bit codes (values 0..3) into bytes, 4 codes per byte,
// little-endian within the byte.  n must be a multiple of 4.
void pack_2bit(const uint8_t* codes, long n, uint8_t* out) {
    for (long i = 0; i < n / 4; ++i) {
        const uint8_t* c = codes + 4 * i;
        out[i] = (uint8_t)(c[0] | (c[1] << 2) | (c[2] << 4) | (c[3] << 6));
    }
}

}  // extern "C"
