// Fast gzip/DEFLATE inflate for the host input pipeline.
//
// The reference's only decompression hook is optional isal igzip
// (bionumpy/io/gzip_reading.py:1-4); this is the TPU build's native
// equivalent: zlib inflates ~250 MB/s/core on this class of host and the
// end-to-end FASTQ pipelines are inflate-bound (docs/performance.md), so
// a libdeflate-style decoder is the single biggest whole-job lever.
//
// Design (RFC 1951/1952):
//  - 64-bit bit buffer refilled once per symbol loop (worst case
//    15+5+15+13 = 48 bits per literal/match; refill keeps >= 56)
//  - two-level Huffman tables: 10-bit root (4 KB, L1-resident) with
//    per-prefix subtables for codes longer than 10 bits
//  - up to three literals decoded per refill
//  - match copies in 8-byte chunks when distance allows
//  - slice-by-8 CRC32 for trailer verification
//
// Exported entry: gzip_inflate_all — inflates every member of a
// (possibly multi-member) gzip byte range into one output buffer.
#include <cstdint>
#include <cstring>

#if defined(__x86_64__)
#include <cpuid.h>
#include <immintrin.h>
#endif

namespace {

constexpr int kRootBits = 10;
constexpr int kRootSize = 1 << kRootBits;
constexpr uint32_t kRootMask = kRootSize - 1;
constexpr uint32_t kInvalid = 0x007F0000u;  // len field 0x7F, not a link
constexpr uint32_t kLinkBit = 0x80000000u;
// zlib's ENOUGH bounds: 852 (litlen, 9-10 bit root) / 592 (dist)
constexpr int kSubCap = 2048;

struct HuffTable {
    uint32_t root[kRootSize];
    uint32_t sub[kSubCap];
};

struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint64_t bits = 0;
    int nbits = 0;

    void refill() {
        if (nbits < 0) return;  // overrun: let the caller's check fire
        if (end - p >= 8) {
            uint64_t w;
            std::memcpy(&w, p, 8);
            bits |= w << nbits;
            int take = (63 - nbits) >> 3;
            p += take;
            nbits += take << 3;
        } else {
            while (nbits <= 56 && p < end) {
                bits |= (uint64_t)(*p++) << nbits;
                nbits += 8;
            }
        }
    }
    uint64_t peek(int n) const { return bits & ((1ull << n) - 1); }
    void drop(int n) { bits >>= n; nbits -= n; }
    uint64_t read(int n) {
        uint64_t v = peek(n);
        drop(n);
        return v;
    }
    bool overrun() const { return nbits < 0; }
    void align_byte() { int r = nbits & 7; bits >>= r; nbits -= r; }
    long byte_pos(const uint8_t* base) const {
        return (long)(p - base) - (nbits >> 3);
    }
};

inline uint32_t bit_reverse(uint32_t c, int len) {
    uint32_t rev = 0;
    for (int b = 0; b < len; ++b) rev |= ((c >> b) & 1u) << (len - 1 - b);
    return rev;
}

// Table kinds and PRE-DECODED entry formats.  The hot loop never
// touches the base/extra side tables: everything a symbol needs is in
// its 32-bit entry (the libdeflate idea, re-derived):
//   PLAIN  (code-length table): (total_len << 16) | symbol; kInvalid
//   LITLEN: literal  kLitBit | (byte << 8) | total_bits
//           length   (len_base << 16) | (extra_bits << 8) | total_bits
//           end      kEobBit | total_bits
//           invalid  0   (also the reserved symbols 286/287)
//   DIST:   distance (dist_base << 16) | (extra_bits << 8) | total_bits
//           invalid  0   (also the reserved symbols 30/31)
//   link (root only, LITLEN/DIST): kLinkBit | (sub_base << 8) | sub_bits
enum TableKind { KIND_PLAIN, KIND_LITLEN, KIND_DIST };

constexpr uint32_t kLitBit = 0x40000000u;
constexpr uint32_t kEobBit = 0x20000000u;
// root-only: entry decodes TWO literals at once (byte0 in bits 8-15,
// byte1 in bits 16-23, combined code length in the low 6 bits) — the
// dominant case for DNA text whose literal codes are 2-4 bits
constexpr uint32_t kLit2Bit = 0x10000000u;

const uint16_t kLenBase[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
                               19, 23, 27, 31, 35, 43, 51, 59, 67, 83,
                               99, 115, 131, 163, 195, 227, 258};
const uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                               2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
                               0};
const uint32_t kDistBase[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49,
                                65, 97, 129, 193, 257, 385, 513, 769,
                                1025, 1537, 2049, 3073, 4097, 6145, 8193,
                                12289, 16385, 24577};
const uint8_t kDistExtra[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                                6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
                                12, 12, 13, 13};

inline uint32_t make_entry(TableKind kind, int sym, int total_bits) {
    if (kind == KIND_PLAIN)
        return ((uint32_t)total_bits << 16) | (uint32_t)sym;
    if (kind == KIND_LITLEN) {
        if (sym < 256)
            return kLitBit | ((uint32_t)sym << 8) | (uint32_t)total_bits;
        if (sym == 256) return kEobBit | (uint32_t)total_bits;
        int i = sym - 257;
        if (i >= 29) return 0;  // reserved 286/287: invalid if decoded
        return ((uint32_t)kLenBase[i] << 16) |
               ((uint32_t)kLenExtra[i] << 8) | (uint32_t)total_bits;
    }
    if (sym >= 30) return 0;  // reserved distance symbols
    return (kDistBase[sym] << 16) | ((uint32_t)kDistExtra[sym] << 8) |
           (uint32_t)total_bits;
}

// Canonical two-level table build with per-kind entries (above).
// Returns false on over-subscription.
bool build_table(const uint8_t* lens, int n_syms, HuffTable* t,
                 TableKind kind = KIND_PLAIN) {
    int count[16] = {0};
    for (int i = 0; i < n_syms; ++i) count[lens[i]]++;
    if (count[0] == n_syms) return false;
    int left = 1;
    for (int l = 1; l <= 15; ++l) {
        left <<= 1;
        left -= count[l];
        if (left < 0) return false;
    }
    uint32_t next_code[16];
    uint32_t code = 0;
    for (int l = 1; l <= 15; ++l) {
        code = (code + count[l - 1]) << 1;
        next_code[l] = code;
    }
    const uint32_t inval = (kind == KIND_PLAIN) ? kInvalid : 0;
    for (int i = 0; i < kRootSize; ++i) t->root[i] = inval;
    // pass 1: per-root-prefix max code length (for subtable sizing)
    uint8_t prefix_max[kRootSize];
    std::memset(prefix_max, 0, sizeof(prefix_max));
    {
        uint32_t nc[16];
        std::memcpy(nc, next_code, sizeof(nc));
        for (int sym = 0; sym < n_syms; ++sym) {
            int l = lens[sym];
            if (l == 0) continue;
            uint32_t rev = bit_reverse(nc[l]++, l);
            if (l > kRootBits) {
                uint32_t pre = rev & kRootMask;
                if (l > prefix_max[pre]) prefix_max[pre] = (uint8_t)l;
            }
        }
    }
    // allocate subtables
    int sub_used = 0;
    for (int pre = 0; pre < kRootSize; ++pre) {
        if (!prefix_max[pre]) continue;
        int sub_bits = prefix_max[pre] - kRootBits;
        int size = 1 << sub_bits;
        if (sub_used + size > kSubCap) return false;
        t->root[pre] = kLinkBit | ((uint32_t)sub_used << 8) |
                       (uint32_t)sub_bits;
        for (int i = 0; i < size; ++i) t->sub[sub_used + i] = inval;
        sub_used += size;
    }
    // pass 2: fill
    for (int sym = 0; sym < n_syms; ++sym) {
        int l = lens[sym];
        if (l == 0) continue;
        uint32_t rev = bit_reverse(next_code[l]++, l);
        uint32_t entry = make_entry(kind, sym, l);
        if (l <= kRootBits) {
            for (uint32_t idx = rev; idx < (uint32_t)kRootSize;
                 idx += (1u << l))
                t->root[idx] = entry;
        } else {
            uint32_t pre = rev & kRootMask;
            uint32_t link = t->root[pre];
            int sub_bits = (int)(link & 0x3F);
            uint32_t base = (link >> 8) & 0xFFF;
            uint32_t idx2 = rev >> kRootBits;
            for (uint32_t i = idx2; i < (1u << sub_bits);
                 i += (1u << (l - kRootBits)))
                t->sub[base + i] = entry;
        }
    }
    // pass 3 (litlen only): fuse literal PAIRS whose combined code
    // length fits the root index — one lookup then emits two bytes.
    // Valid because root[idx >> l0]'s entry repeats at stride 2^l1, so
    // when l0 + l1 <= kRootBits the second symbol is fully determined
    // by the remaining root bits of idx.
    if (kind == KIND_LITLEN) {
        // read from a snapshot: fused entries must not feed the pass
        uint32_t single[kRootSize];
        std::memcpy(single, t->root, sizeof(single));
        for (int idx = 0; idx < kRootSize; ++idx) {
            uint32_t e0 = single[idx];
            if ((e0 & (kLitBit | kLinkBit)) != kLitBit) continue;
            int l0 = (int)(e0 & 0x3F);
            uint32_t e1 = single[idx >> l0];
            if ((e1 & (kLitBit | kLinkBit)) != kLitBit) continue;
            int l1 = (int)(e1 & 0x3F);
            if (l0 + l1 > kRootBits) continue;
            t->root[idx] = kLitBit | kLit2Bit |
                           (((e1 >> 8) & 0xFFu) << 16) |
                           (e0 & 0xFF00u) | (uint32_t)(l0 + l1);
        }
    }
    return true;
}

// decode one PLAIN symbol; returns symbol or -1 on invalid code.
// (The code-length table only — its codes are <= 7 bits, never linked.)
inline int decode(const HuffTable& t, BitReader& br) {
    uint32_t e = t.root[br.bits & kRootMask];
    int len = (int)(e >> 16);
    if (len == 0x7F) return -1;
    br.drop(len);
    return (int)(e & 0xFFFF);
}

// one LITLEN/DIST table lookup (resolving a link); drops NO bits —
// the caller reads total_bits from the entry's low byte.
inline uint32_t decode_entry(const HuffTable& t, const BitReader& br) {
    uint32_t e = t.root[br.bits & kRootMask];
    if (e & kLinkBit)
        e = t.sub[((e >> 8) & 0xFFF) +
                  ((br.bits >> kRootBits) & ((1u << (e & 0x3F)) - 1))];
    return e;
}

struct Tables {
    HuffTable litlen;
    HuffTable dist;
};

const Tables& fixed_tables() {
    static Tables t = [] {
        Tables tt;
        uint8_t lens[288];
        for (int i = 0; i < 144; ++i) lens[i] = 8;
        for (int i = 144; i < 256; ++i) lens[i] = 9;
        for (int i = 256; i < 280; ++i) lens[i] = 7;
        for (int i = 280; i < 288; ++i) lens[i] = 8;
        build_table(lens, 288, &tt.litlen, KIND_LITLEN);
        uint8_t dlens[30];
        for (int i = 0; i < 30; ++i) dlens[i] = 5;
        build_table(dlens, 30, &tt.dist, KIND_DIST);
        return tt;
    }();
    return t;
}

struct CrcTables {
    uint32_t t[8][256];
    CrcTables() {
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t c = i;
            for (int k = 0; k < 8; ++k)
                c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
            t[0][i] = c;
        }
        for (int s = 1; s < 8; ++s)
            for (uint32_t i = 0; i < 256; ++i)
                t[s][i] = (t[s - 1][i] >> 8) ^ t[0][t[s - 1][i] & 0xFF];
    }
};

// Table run over bytes from a RAW state (init/final complements are
// the caller's affair).  When `count` is non-null, occurrences of
// `value` are tallied in the same pass — the bytes are already in
// registers, so the count is nearly free while a separate scan would
// cost a full memory pass (this host is bandwidth-throttled).
inline uint32_t crc32_table_run(const CrcTables& ct, uint32_t s,
                                const uint8_t* p, long n,
                                int value = -1, long* count = nullptr) {
    long cnt = 0;
    while (n >= 8) {
        uint32_t lo, hi;
        std::memcpy(&lo, p, 4);
        std::memcpy(&hi, p + 4, 4);
        if (count) {
            // SWAR equal-byte count: carry-free exact zero-byte mask
            // (the (x-1)&~x variant miscounts after a borrow)
            uint32_t v = 0x01010101u * (uint8_t)value;
            uint32_t a = lo ^ v, b = hi ^ v;
            uint32_t ma = ~((((a & 0x7F7F7F7Fu) + 0x7F7F7F7Fu) | a) |
                            0x7F7F7F7Fu);
            uint32_t mb = ~((((b & 0x7F7F7F7Fu) + 0x7F7F7F7Fu) | b) |
                            0x7F7F7F7Fu);
            cnt += __builtin_popcount(ma) + __builtin_popcount(mb);
        }
        lo ^= s;
        s = ct.t[7][lo & 0xFF] ^ ct.t[6][(lo >> 8) & 0xFF] ^
            ct.t[5][(lo >> 16) & 0xFF] ^ ct.t[4][lo >> 24] ^
            ct.t[3][hi & 0xFF] ^ ct.t[2][(hi >> 8) & 0xFF] ^
            ct.t[1][(hi >> 16) & 0xFF] ^ ct.t[0][hi >> 24];
        p += 8;
        n -= 8;
    }
    while (n-- > 0) {
        if (count && *p == (uint8_t)value) ++cnt;
        s = ct.t[0][(s ^ *p++) & 0xFF] ^ (s >> 8);
    }
    if (count) *count += cnt;
    return s;
}

#if defined(__x86_64__)
bool has_pclmul() {
    unsigned a, b, c, d;
    if (!__get_cpuid(1, &a, &b, &c, &d)) return false;
    return (c & bit_PCLMUL) && (c & bit_SSE4_1);
}

// CRC-32 (gzip polynomial, reflected) folding with carry-less
// multiplies: each step folds a block by distance D bytes using the
// reflected constants x^(8D+32) and x^(8D-32) mod P (derived and
// verified against the bitwise model; D=64 inner loop, D=16 merges).
// Folds `n` = 64 + 16k bytes (seeded with the raw 32-bit state) down
// to ONE 16-byte residue whose plain table-CRC from state 0 equals the
// CRC of the whole input — no 128->32 Barrett step needed.
// When `count` is non-null, occurrences of `value` among the REAL
// input bytes are tallied in the same pass via cmpeq/psadbw (the fold
// residue is state, not input, and is never counted).
__attribute__((target("pclmul,sse4.1")))
void crc32_fold_clmul(const uint8_t* p, long n, uint32_t seed,
                      uint8_t out16[16], int value, long* count) {
    const __m128i k64 = _mm_set_epi64x(0x01c6e41596ll,   // x^(512-32)
                                       0x0154442bd4ll);  // x^(512+32)
    const __m128i k16 = _mm_set_epi64x(0x0ccaa009ell,    // x^(128-32)
                                       0x01751997d0ll);  // x^(128+32)
    const __m128i needle = _mm_set1_epi8((char)value);
    __m128i lane_cnt = _mm_setzero_si128();  // per-byte-lane tallies
    __m128i total = _mm_setzero_si128();     // 64-bit lane totals
    int rounds = 0;
    __m128i x0 = _mm_loadu_si128((const __m128i*)p);
    __m128i x1 = _mm_loadu_si128((const __m128i*)(p + 16));
    __m128i x2 = _mm_loadu_si128((const __m128i*)(p + 32));
    __m128i x3 = _mm_loadu_si128((const __m128i*)(p + 48));
    if (count) {
        lane_cnt = _mm_sub_epi8(lane_cnt, _mm_cmpeq_epi8(x0, needle));
        lane_cnt = _mm_sub_epi8(lane_cnt, _mm_cmpeq_epi8(x1, needle));
        lane_cnt = _mm_sub_epi8(lane_cnt, _mm_cmpeq_epi8(x2, needle));
        lane_cnt = _mm_sub_epi8(lane_cnt, _mm_cmpeq_epi8(x3, needle));
        rounds = 1;
    }
    x0 = _mm_xor_si128(x0, _mm_cvtsi32_si128((int)seed));
    p += 64;
    n -= 64;
    while (n >= 64) {
        __m128i t0 = _mm_loadu_si128((const __m128i*)p);
        __m128i t1 = _mm_loadu_si128((const __m128i*)(p + 16));
        __m128i t2 = _mm_loadu_si128((const __m128i*)(p + 32));
        __m128i t3 = _mm_loadu_si128((const __m128i*)(p + 48));
        if (count) {
            lane_cnt = _mm_sub_epi8(lane_cnt,
                                    _mm_cmpeq_epi8(t0, needle));
            lane_cnt = _mm_sub_epi8(lane_cnt,
                                    _mm_cmpeq_epi8(t1, needle));
            lane_cnt = _mm_sub_epi8(lane_cnt,
                                    _mm_cmpeq_epi8(t2, needle));
            lane_cnt = _mm_sub_epi8(lane_cnt,
                                    _mm_cmpeq_epi8(t3, needle));
            if (++rounds >= 62) {  // 62 * 4 < 255: no lane overflow
                total = _mm_add_epi64(
                    total, _mm_sad_epu8(lane_cnt,
                                        _mm_setzero_si128()));
                lane_cnt = _mm_setzero_si128();
                rounds = 0;
            }
        }
        __m128i y;
        y = _mm_clmulepi64_si128(x0, k64, 0x00);
        x0 = _mm_clmulepi64_si128(x0, k64, 0x11);
        x0 = _mm_xor_si128(_mm_xor_si128(x0, y), t0);
        y = _mm_clmulepi64_si128(x1, k64, 0x00);
        x1 = _mm_clmulepi64_si128(x1, k64, 0x11);
        x1 = _mm_xor_si128(_mm_xor_si128(x1, y), t1);
        y = _mm_clmulepi64_si128(x2, k64, 0x00);
        x2 = _mm_clmulepi64_si128(x2, k64, 0x11);
        x2 = _mm_xor_si128(_mm_xor_si128(x2, y), t2);
        y = _mm_clmulepi64_si128(x3, k64, 0x00);
        x3 = _mm_clmulepi64_si128(x3, k64, 0x11);
        x3 = _mm_xor_si128(_mm_xor_si128(x3, y), t3);
        p += 64;
        n -= 64;
    }
    // merge the four lanes (each fold jumps 16 bytes forward)
    __m128i y;
    y = _mm_clmulepi64_si128(x0, k16, 0x00);
    x0 = _mm_clmulepi64_si128(x0, k16, 0x11);
    x1 = _mm_xor_si128(_mm_xor_si128(x1, y), x0);
    y = _mm_clmulepi64_si128(x1, k16, 0x00);
    x1 = _mm_clmulepi64_si128(x1, k16, 0x11);
    x2 = _mm_xor_si128(_mm_xor_si128(x2, y), x1);
    y = _mm_clmulepi64_si128(x2, k16, 0x00);
    x2 = _mm_clmulepi64_si128(x2, k16, 0x11);
    x3 = _mm_xor_si128(_mm_xor_si128(x3, y), x2);
    // fold remaining whole 16-byte blocks
    while (n >= 16) {
        __m128i t = _mm_loadu_si128((const __m128i*)p);
        if (count) {
            lane_cnt = _mm_sub_epi8(lane_cnt,
                                    _mm_cmpeq_epi8(t, needle));
            if (++rounds >= 62) {
                total = _mm_add_epi64(
                    total, _mm_sad_epu8(lane_cnt,
                                        _mm_setzero_si128()));
                lane_cnt = _mm_setzero_si128();
                rounds = 0;
            }
        }
        y = _mm_clmulepi64_si128(x3, k16, 0x00);
        x3 = _mm_clmulepi64_si128(x3, k16, 0x11);
        x3 = _mm_xor_si128(_mm_xor_si128(x3, y), t);
        p += 16;
        n -= 16;
    }
    if (count) {
        total = _mm_add_epi64(
            total, _mm_sad_epu8(lane_cnt, _mm_setzero_si128()));
        *count += (long)(_mm_cvtsi128_si64(total) +
                         _mm_extract_epi64(total, 1));
    }
    _mm_storeu_si128((__m128i*)out16, x3);
}
#endif

// CRC over p[0:n]; when `count` is non-null, also tallies occurrences
// of `value` in the same memory pass.
uint32_t crc32_count(const uint8_t* p, long n, uint32_t crc,
                     int value, long* count) {
    static const CrcTables ct;
    uint32_t s = ~crc;
#if defined(__x86_64__)
    static const bool use_clmul = has_pclmul();
    if (use_clmul && n >= 128) {
        long main_n = 64 + (((n - 64) >> 4) << 4);  // 64 + 16k bytes
        uint8_t residue[16];
        crc32_fold_clmul(p, main_n, s, residue, value, count);
        p += main_n;
        n -= main_n;
        s = crc32_table_run(ct, 0, residue, 16);  // state: never counted
    }
#endif
    s = crc32_table_run(ct, s, p, n, value, count);
    return ~s;
}

uint32_t crc32_fast(const uint8_t* p, long n, uint32_t crc) {
    return crc32_count(p, n, crc, -1, nullptr);
}

constexpr long ERR_FORMAT = -1;
constexpr long ERR_OUTPUT_FULL = -2;
constexpr long ERR_CRC = -3;

long inflate_raw(const uint8_t* in, long in_len, uint8_t* out,
                 long out_cap, long* in_consumed) {
    BitReader br{in, in + in_len};
    uint8_t* o = out;
    uint8_t* o_end = out + out_cap;
    Tables dyn;
    for (;;) {
        br.refill();
        if (br.nbits < 3) return ERR_FORMAT;
        int bfinal = (int)br.read(1);
        int btype = (int)br.read(2);
        if (btype == 0) {  // stored
            br.align_byte();
            long pos = br.byte_pos(in);
            if (pos + 4 > in_len) return ERR_FORMAT;
            uint16_t len, nlen;
            std::memcpy(&len, in + pos, 2);
            std::memcpy(&nlen, in + pos + 2, 2);
            if ((uint16_t)~len != nlen) return ERR_FORMAT;
            pos += 4;
            if (pos + len > in_len) return ERR_FORMAT;
            if (o + len > o_end) return ERR_OUTPUT_FULL;
            std::memcpy(o, in + pos, len);
            o += len;
            pos += len;
            br = BitReader{in + pos, in + in_len};
        } else if (btype == 1 || btype == 2) {
            const HuffTable* litlen_tab;
            const HuffTable* dist_tab;
            if (btype == 1) {
                litlen_tab = &fixed_tables().litlen;
                dist_tab = &fixed_tables().dist;
            } else {
                int hlit = (int)br.read(5) + 257;
                int hdist = (int)br.read(5) + 1;
                int hclen = (int)br.read(4) + 4;
                if (hlit > 288 || hdist > 30) return ERR_FORMAT;
                static const uint8_t order[19] = {
                    16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13,
                    2, 14, 1, 15};
                uint8_t cl_lens[19] = {0};
                for (int i = 0; i < hclen; ++i) {
                    br.refill();
                    cl_lens[order[i]] = (uint8_t)br.read(3);
                }
                HuffTable cl_table;
                if (!build_table(cl_lens, 19, &cl_table))
                    return ERR_FORMAT;
                uint8_t lens[288 + 30] = {0};
                int n = hlit + hdist;
                for (int i = 0; i < n;) {
                    br.refill();
                    int sym = decode(cl_table, br);
                    if (sym < 0 || br.overrun()) return ERR_FORMAT;
                    if (sym < 16) {
                        lens[i++] = (uint8_t)sym;
                    } else if (sym == 16) {
                        if (i == 0) return ERR_FORMAT;
                        int rep = 3 + (int)br.read(2);
                        if (i + rep > n) return ERR_FORMAT;
                        uint8_t prev = lens[i - 1];
                        while (rep--) lens[i++] = prev;
                    } else if (sym == 17) {
                        int rep = 3 + (int)br.read(3);
                        if (i + rep > n) return ERR_FORMAT;
                        i += rep;
                    } else {
                        int rep = 11 + (int)br.read(7);
                        if (i + rep > n) return ERR_FORMAT;
                        i += rep;
                    }
                }
                if (lens[256] == 0) return ERR_FORMAT;
                if (!build_table(lens, hlit, &dyn.litlen, KIND_LITLEN))
                    return ERR_FORMAT;
                if (!build_table(lens + hlit, hdist, &dyn.dist,
                                 KIND_DIST)) {
                    // no distance codes at all: literal-only block;
                    // any match hit must then error
                    for (int i = 0; i < kRootSize; ++i)
                        dyn.dist.root[i] = 0;
                }
                litlen_tab = &dyn.litlen;
                dist_tab = &dyn.dist;
            }
            const HuffTable& lt = *litlen_tab;
            const HuffTable& dt = *dist_tab;
            for (;;) {
                br.refill();
                if (br.overrun() || (br.nbits <= 0 && br.p >= br.end))
                    return ERR_FORMAT;
                uint32_t e = decode_entry(lt, br);
                if (e & kLitBit) {
                    // fast path: three entries on these bits, each
                    // emitting 1-2 bytes (worst case 3 x 15 = 45 bits
                    // <= 56; a FUSED pair entry is <= kRootBits)
                    br.drop((int)(e & 0x3F));
                    if (o + 8 <= o_end) {
                        o[0] = (uint8_t)(e >> 8);
                        o[1] = (uint8_t)(e >> 16);
                        o += 1 + ((e >> 28) & 1);
                        e = decode_entry(lt, br);
                        if (e & kLitBit) {
                            br.drop((int)(e & 0x3F));
                            o[0] = (uint8_t)(e >> 8);
                            o[1] = (uint8_t)(e >> 16);
                            o += 1 + ((e >> 28) & 1);
                            e = decode_entry(lt, br);
                            if (e & kLitBit) {
                                br.drop((int)(e & 0x3F));
                                o[0] = (uint8_t)(e >> 8);
                                o[1] = (uint8_t)(e >> 16);
                                o += 1 + ((e >> 28) & 1);
                                continue;
                            }
                        }
                        // fall through with a non-literal entry
                    } else {
                        if (o >= o_end) return ERR_OUTPUT_FULL;
                        *o++ = (uint8_t)(e >> 8);
                        if (e & kLit2Bit) {
                            if (o >= o_end) return ERR_OUTPUT_FULL;
                            *o++ = (uint8_t)(e >> 16);
                        }
                        continue;
                    }
                }
                if (e == 0) return ERR_FORMAT;
                if (e & kEobBit) {
                    br.drop((int)(e & 0x3F));
                    break;
                }
                // length entry: base and extra-bit count are inline;
                // worst case here is 15 code + 5 extra = 20 bits with
                // >= 26 still buffered after two literals
                {
                    int cb = (int)(e & 0x3F);
                    int ext = (int)((e >> 8) & 0xF);
                    long length = (long)(e >> 16) +
                                  (long)((br.bits >> cb) &
                                         ((1u << ext) - 1));
                    br.drop(cb + ext);
                    br.refill();
                    uint32_t d = decode_entry(dt, br);
                    if (d == 0) return ERR_FORMAT;
                    int dcb = (int)(d & 0x3F);
                    int dext = (int)((d >> 8) & 0xF);
                    long dist = (long)(d >> 16) +
                                (long)((br.bits >> dcb) &
                                       ((1u << dext) - 1));
                    br.drop(dcb + dext);
                    if (dist > o - out) return ERR_FORMAT;
                    if (o + length > o_end) return ERR_OUTPUT_FULL;
                    const uint8_t* src = o - dist;
                    uint8_t* stop = o + length;
                    if (dist >= 16 && o_end - stop >= 16) {
                        // 16-wise with rounded-up tail: the <=15 bytes
                        // written past `stop` are scratch that later
                        // output overwrites (slack checked above)
                        do {
                            std::memcpy(o, src, 16);
                            o += 16;
                            src += 16;
                        } while (o < stop);
                        o = stop;
                    } else if (dist >= 8 && o_end - stop >= 8) {
                        do {
                            std::memcpy(o, src, 8);
                            o += 8;
                            src += 8;
                        } while (o < stop);
                        o = stop;
                    } else if (dist == 1) {
                        std::memset(o, o[-1], (size_t)length);
                        o = stop;
                    } else {
                        while (o < stop) *o++ = *src++;
                    }
                }
            }
            if (br.overrun()) return ERR_FORMAT;
        } else {
            return ERR_FORMAT;
        }
        if (bfinal) break;
    }
    br.align_byte();
    *in_consumed = br.byte_pos(in);
    if (*in_consumed > in_len) return ERR_FORMAT;
    return (long)(o - out);
}

long gzip_inflate_impl(const uint8_t* in, long n, uint8_t* out,
                       long out_cap, int verify, int count_value,
                       long* count_out) {
    long ipos = 0;
    long opos = 0;
    while (ipos < n) {
        if (n - ipos < 18) return ERR_FORMAT;  // minimal member
        const uint8_t* h = in + ipos;
        if (h[0] != 0x1F || h[1] != 0x8B || h[2] != 8) return ERR_FORMAT;
        uint8_t flg = h[3];
        if (flg & 0xE0) return ERR_FORMAT;
        long p = ipos + 10;
        if (flg & 4) {  // FEXTRA
            if (p + 2 > n) return ERR_FORMAT;
            uint16_t xlen;
            std::memcpy(&xlen, in + p, 2);
            p += 2 + xlen;
        }
        if (flg & 8) {  // FNAME
            while (p < n && in[p]) ++p;
            ++p;
        }
        if (flg & 16) {  // FCOMMENT
            while (p < n && in[p]) ++p;
            ++p;
        }
        if (flg & 2) p += 2;  // FHCRC
        if (p >= n) return ERR_FORMAT;
        long consumed = 0;
        long written = inflate_raw(in + p, n - p, out + opos,
                                   out_cap - opos, &consumed);
        if (written < 0) return written;
        p += consumed;
        if (p + 8 > n) return ERR_FORMAT;  // trailer
        if (verify) {
            uint32_t crc, isize;
            std::memcpy(&crc, in + p, 4);
            std::memcpy(&isize, in + p + 4, 4);
            if (isize != (uint32_t)written) return ERR_CRC;
            if (crc32_count(out + opos, written, 0, count_value,
                            count_out) != crc)
                return ERR_CRC;
        } else if (count_out) {
            crc32_count(out + opos, written, 0, count_value, count_out);
        }
        opos += written;
        ipos = p + 8;
    }
    return opos;
}

}  // namespace

extern "C" {

// Inflate every gzip member in in[0:n] into out[0:out_cap].
// Returns total decompressed bytes; negative on error:
//   -1 malformed, -2 out_cap too small (caller grows + retries),
//   -3 CRC/ISIZE mismatch (when verify != 0).
long gzip_inflate_all(const uint8_t* in, long n, uint8_t* out,
                      long out_cap, int verify) {
    return gzip_inflate_impl(in, n, out, out_cap, verify, -1, nullptr);
}

// gzip_inflate_all with verification AND a fused byte-value count:
// occurrences of `count_value` in the decompressed output are tallied
// during the CRC pass (one memory pass instead of two on this
// bandwidth-throttled host class) and stored to *count_out.
long gzip_inflate_count(const uint8_t* in, long n, uint8_t* out,
                        long out_cap, int count_value,
                        long* count_out) {
    *count_out = 0;
    return gzip_inflate_impl(in, n, out, out_cap, 1, count_value,
                             count_out);
}

}  // extern "C"
