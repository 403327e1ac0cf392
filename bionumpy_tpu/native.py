"""ctypes bindings for the native host kernels (csrc/host_kernels.cpp).

Built on demand with g++; every entry point has a pure-numpy fallback so
the package works without a compiler."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_host_kernels.so")
_CSRC = os.path.join(os.path.dirname(__file__), os.pardir, "csrc")
_SRC_PATHS = [os.path.join(_CSRC, "host_kernels.cpp"),
              os.path.join(_CSRC, "inflate.cpp")]
_SRC_PATH = _SRC_PATHS[0]
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    sources = [s for s in _SRC_PATHS if os.path.exists(s)]
    stale = (os.path.exists(_LIB_PATH) and sources and
             any(os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
                 for s in sources))
    if (not os.path.exists(_LIB_PATH) or stale) and sources:
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-pthread",
                            "-o", _LIB_PATH] + sources, check=True,
                           capture_output=True)
        except Exception as e:
            logger.info("could not build native kernels: %s", e)
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bam_find_starts.restype = ctypes.c_long
    lib.bam_find_starts.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_long]
    lib.pack_2bit.restype = None
    lib.pack_2bit.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                              ctypes.c_long,
                              ctypes.POINTER(ctypes.c_uint8)]
    lib.pack_2bit_fill.restype = None
    lib.pack_2bit_fill.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_long, ctypes.c_int]
    lib.kmer_correction_sums.restype = None
    lib.kmer_correction_sums.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32)]
    lib.fastq_parse_pack.restype = ctypes.c_long
    lib.fastq_parse_pack.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
    lib.gzip_inflate_all.restype = ctypes.c_long
    lib.gzip_inflate_all.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int]
    lib.gzip_inflate_count.restype = ctypes.c_long
    lib.gzip_inflate_count.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_long)]
    lib.count_byte.restype = ctypes.c_long
    lib.count_byte.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_uint8,
        ctypes.c_int]
    lib.copy_2bit_shifted.restype = None
    lib.copy_2bit_shifted.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.count_two_bytes.restype = ctypes.c_long
    lib.count_two_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_uint8,
        ctypes.c_uint8]
    lib.find_two_bytes.restype = ctypes.c_long
    lib.find_two_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_uint8,
        ctypes.c_uint8, ctypes.POINTER(ctypes.c_int64)]
    lib.gather_rows_u8.restype = ctypes.c_long
    lib.gather_rows_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)]
    lib.parse_ints.restype = ctypes.c_long
    lib.parse_ints.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_long, ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def has_native() -> bool:
    return _load() is not None


def bam_find_starts(chunk: np.ndarray) -> np.ndarray:
    """All BAM record start offsets <= len(chunk), starting at 0."""
    lib = _load()
    chunk = np.ascontiguousarray(chunk, dtype=np.uint8)
    if lib is None:
        return _bam_find_starts_py(chunk)
    max_starts = len(chunk) // 4 + 2
    starts = np.empty(max_starts, dtype=np.int64)
    count = lib.bam_find_starts(
        chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(chunk),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        max_starts)
    if count < 0:
        raise ValueError("corrupt BAM block length")
    return starts[:count]


def _bam_find_starts_py(chunk: np.ndarray) -> np.ndarray:
    n = len(chunk)
    if n < 4:
        return np.array([0], dtype=np.int64)
    padded = np.append(chunk, np.zeros(4, dtype=np.uint8))
    le32 = (padded[:-3].astype(np.int64)
            | (padded[1:-2].astype(np.int64) << 8)
            | (padded[2:-1].astype(np.int64) << 16)
            | (padded[3:].astype(np.int64) << 24))
    starts = [0]
    pos = 0
    while pos + 4 <= n:
        nxt = pos + 4 + int(le32[pos])
        if nxt <= pos:
            raise ValueError("corrupt BAM block length")
        if nxt > n:
            break
        starts.append(nxt)
        pos = nxt
    return np.array(starts, dtype=np.int64)


def pack_2bit_fill(codes: np.ndarray, out_bytes: int,
                   n_threads: int = None) -> np.ndarray:
    """Pack len(codes) 2-bit codes into an `out_bytes`-byte buffer,
    zero-filling past the packed prefix — no pre-padded copy of the
    codes is made (multithreaded)."""
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    assert out_bytes * 4 >= len(codes)
    if lib is None:
        n4 = (len(codes) + 3) // 4 * 4
        padded = np.zeros(n4, dtype=np.uint8)
        padded[: len(codes)] = codes
        out = np.zeros(out_bytes, dtype=np.uint8)
        out[: n4 // 4] = pack_2bit(padded)
        return out
    if n_threads is None:
        n_threads = min(4, os.cpu_count() or 1)
    out = np.empty(out_bytes, dtype=np.uint8)
    lib.pack_2bit_fill(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(codes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_bytes,
        n_threads)
    return out


def kmer_correction_sums(packed: np.ndarray, ends: np.ndarray,
                         starts: np.ndarray, k: int,
                         n_threads: int = None) -> tuple:
    """(lo_sum, hi_sum) mod 2^32 of the limbs of every row-crossing
    window (the up-to-(k-1) windows before each row end), recomputed
    from the 2-bit-packed byte buffer.  Subtracting these from the
    device's unmasked full sums yields the valid-window checksum; runs
    on host threads, overlapped with the device pass."""
    lib = _load()
    packed = np.ascontiguousarray(packed.view(np.uint8).ravel())
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    assert len(ends) == len(starts)
    if lib is None:
        return _kmer_correction_sums_py(packed, ends, starts, k)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    out = np.zeros(2, dtype=np.uint32)
    lib.kmer_correction_sums(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(packed),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ends), k, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return int(out[0]), int(out[1])


def _kmer_correction_sums_py(packed: np.ndarray, ends: np.ndarray,
                             starts: np.ndarray, k: int) -> tuple:
    """Vectorized numpy twin of the native correction kernel."""
    if len(ends) == 0 or k <= 1:
        return 0, 0
    offs = np.arange(k - 1, 0, -1, dtype=np.int64)
    pos = ends[:, None] - offs[None, :]                     # (R, k-1)
    mask = pos >= starts[:, None]
    pos = np.maximum(pos, 0)
    # gather 2x uint64 straddling each window start (unaligned loads via
    # per-byte gathers on a zero-extended buffer)
    byte = (pos >> 2).ravel()
    sh = ((pos & 3) * 2).astype(np.uint64).ravel()
    buf = np.zeros(len(packed) + 16, dtype=np.uint8)
    buf[: len(packed)] = packed
    idx = byte[:, None] + np.arange(16, dtype=np.int64)
    b = buf[idx].astype(np.uint64)
    shifts8 = np.uint64(8) * np.arange(8, dtype=np.uint64)
    w0 = (b[:, :8] << shifts8).sum(axis=-1, dtype=np.uint64)
    w1 = (b[:, 8:] << shifts8).sum(axis=-1, dtype=np.uint64)
    val = (w0 >> sh) | np.where(sh == 0, np.uint64(0),
                                w1 << (np.uint64(64) - sh))
    if 2 * k < 64:
        val &= np.uint64((1 << (2 * k)) - 1)
    val = np.where(mask.ravel(), val, np.uint64(0))
    lo = int(np.sum(val & np.uint64(0xFFFFFFFF),
                    dtype=np.uint64) & np.uint64(0xFFFFFFFF))
    hi = int(np.sum(val >> np.uint64(32),
                    dtype=np.uint64) & np.uint64(0xFFFFFFFF))
    return lo, hi


def fastq_parse_pack(raw: np.ndarray, out_bytes: int = None,
                     n_threads: int = None):
    """Fused FASTQ chunk parse: raw bytes (ending on an entry boundary)
    -> (packed 2-bit words as uint8 of size out_bytes, int32 sequence
    lengths, n_bases).  One multithreaded native pass replaces the
    reference's separate newline-scan / field-gather / encode passes
    (reference: bionumpy/io/one_line_buffer.py:36-71 +
    bionumpy/io/fastq_buffer.py:14-61).

    Raises FormatException-compatible ValueError with the byte offset of
    the first malformed/unencodable byte."""
    lib = _load()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    n = len(raw)
    if out_bytes is None:
        out_bytes = n // 4 + 16
    if lib is None:
        return _fastq_parse_pack_py(raw, out_bytes)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    max_entries = n // 5 + 2   # an entry is at least '@\nA\n+\nB\n'... 8B
    lengths = np.empty(max_entries, dtype=np.int32)
    out = np.empty(out_bytes, dtype=np.uint8)
    n_bases = np.zeros(1, dtype=np.int64)
    res = lib.fastq_parse_pack(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_bytes,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_entries, n_threads,
        n_bases.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if res < 0:
        raise ValueError(
            f"malformed FASTQ chunk at byte {-res - 1}")
    return out, lengths[:res].copy(), int(n_bases[0])


def _fastq_parse_pack_py(raw: np.ndarray, out_bytes: int):
    """Numpy twin of the native fused FASTQ parse."""
    nl = np.flatnonzero(raw == 10)
    if len(nl) % 4 != 0:
        raise ValueError(f"malformed FASTQ chunk at byte {len(raw)}")
    n_entries = len(nl) // 4
    if n_entries == 0:
        return np.zeros(out_bytes, np.uint8), np.empty(0, np.int32), 0
    starts = np.insert(nl[:-1] + 1, 0, 0)
    h_starts = starts[0::4]
    p_starts = starts[2::4]
    if not (np.all(raw[h_starts] == ord("@")) and
            np.all(raw[p_starts] == ord("+"))):
        bad = np.flatnonzero(raw[h_starts] != ord("@"))
        pos = h_starts[bad[0]] if len(bad) else \
            p_starts[np.flatnonzero(raw[p_starts] != ord("+"))[0]]
        raise ValueError(f"malformed FASTQ chunk at byte {pos}")
    s_starts = starts[1::4]
    s_lens = nl[1::4] - s_starts
    q_lens = nl[3::4] - starts[3::4]
    if not np.all(q_lens == s_lens):
        pos = starts[3::4][np.flatnonzero(q_lens != s_lens)[0]]
        raise ValueError(f"malformed FASTQ chunk at byte {pos}")
    enc = np.full(256, 255, np.uint8)
    for i, cs in enumerate("ACGT"):
        enc[ord(cs)] = i
        enc[ord(cs.lower())] = i
    idx = np.repeat(s_starts - np.insert(np.cumsum(s_lens)[:-1], 0, 0),
                    s_lens) + np.arange(int(s_lens.sum()), dtype=np.int64)
    codes = enc[raw[idx]]
    bad = np.flatnonzero(codes == 255)
    if len(bad):
        raise ValueError(f"malformed FASTQ chunk at byte {idx[bad[0]]}")
    n_bases = len(codes)
    out = pack_2bit_fill(codes, out_bytes)
    return out, s_lens.astype(np.int32), n_bases


def gzip_inflate(data, verify: bool = True, size_hint: int = None):
    """Inflate a whole (possibly multi-member) gzip byte string with the
    native libdeflate-style decoder (csrc/inflate.cpp); ~3x zlib on this
    host.  Returns bytes, or None when the native library is missing
    (callers fall back to zlib).  Raises zlib-compatible errors on
    malformed input so io/pgzip.py's boundary repair keeps working."""
    import zlib
    lib = _load()
    if lib is None:
        return None
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    n = len(data)
    if n == 0:
        return b""
    cap = size_hint if size_hint else max(4 * n + 1024, 1 << 16)
    while True:
        out = np.empty(cap, dtype=np.uint8)
        res = lib.gzip_inflate_all(
            ctypes.cast(ctypes.c_char_p(data),
                        ctypes.POINTER(ctypes.c_uint8)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            1 if verify else 0)
        if res >= 0:
            return out[:res].tobytes()
        if res == -2:
            cap *= 2
            continue
        if res == -3:
            raise zlib.error("native inflate: CRC/length mismatch")
        raise zlib.error("native inflate: malformed gzip stream")


def count_byte(buf: np.ndarray, value: int, n_threads: int = None) -> int:
    """Occurrences of `value` in a contiguous uint8 buffer at memchr
    speed (bytes.count for ndarrays without the tobytes copy)."""
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    if lib is None:
        return int(np.count_nonzero(buf == value))
    if n_threads is None:
        n_threads = min(4, os.cpu_count() or 1)
    return int(lib.count_byte(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        value, n_threads))


def gzip_inflate_into(data: bytes, start: int, end: int,
                      out: np.ndarray, out_off: int, expect: int) -> bool:
    """Inflate the gzip member in data[start:end] DIRECTLY into
    out[out_off : out_off + expect] (no intermediate bytes object).

    Returns True iff inflation succeeded, produced exactly `expect`
    bytes, and the CRC verified; False on any mismatch or when the
    native library is missing (callers fall back to a copying path).
    Safe to call concurrently for disjoint output ranges."""
    lib = _load()
    if lib is None:
        return False
    base = np.frombuffer(data, np.uint8).ctypes.data  # zero-copy view
    src = ctypes.cast(ctypes.c_void_p(base + start),
                      ctypes.POINTER(ctypes.c_uint8))
    dst = ctypes.cast(ctypes.c_void_p(out.ctypes.data + out_off),
                      ctypes.POINTER(ctypes.c_uint8))
    res = lib.gzip_inflate_all(src, end - start, dst, expect, 1)
    return res == expect


def gzip_inflate_count_into(data, start: int, end: int, out: np.ndarray,
                            out_off: int, expect: int,
                            value: int = 10) -> int:
    """gzip_inflate_into with a FUSED byte-value count: occurrences of
    `value` in the inflated output are tallied during the CRC-verify
    pass (one memory pass instead of two on a bandwidth-throttled
    host).  Returns the count, or -1 on any mismatch / missing
    library."""
    lib = _load()
    if lib is None:
        return -1
    base = np.frombuffer(data, np.uint8).ctypes.data  # zero-copy view
    src = ctypes.cast(ctypes.c_void_p(base + start),
                      ctypes.POINTER(ctypes.c_uint8))
    dst = ctypes.cast(ctypes.c_void_p(out.ctypes.data + out_off),
                      ctypes.POINTER(ctypes.c_uint8))
    cnt = ctypes.c_long(0)
    res = lib.gzip_inflate_count(src, end - start, dst, expect, value,
                                 ctypes.byref(cnt))
    return int(cnt.value) if res == expect else -1


def gather_rows(src: np.ndarray, starts: np.ndarray,
                lens: np.ndarray):
    """Packed gather of per-row byte slices [starts[r], starts[r]+
    lens[r]) from a contiguous uint8 buffer — one memcpy pass (csrc
    gather_rows_u8) instead of numpy's 6-pass int64 index plan.  The
    hot path of delimited-format column extraction.  Returns the flat
    uint8 result, or None when the native library is missing or a row
    is out of bounds (caller uses the checked numpy plan)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    if len(lens) and (lens.min() < 0 or starts.min() < 0
                      or int((starts + lens).max()) > len(src)):
        # a malformed plan (e.g. field_ends < field_starts) must fall
        # back to the checked numpy path BEFORE sizing the output: the
        # kernel validates per row, but a negative length after valid
        # rows would overflow an output sized by the (smaller) sum
        return None
    total = int(lens.sum())
    out = np.empty(total + 8, dtype=np.uint8)  # kernel needs 7B slack
    got = lib.gather_rows_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(starts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if got != total:
        return None
    return out[:total]


def parse_ints(src: np.ndarray, starts: np.ndarray,
               ends: np.ndarray):
    """Parse signed decimal rows [starts[r], ends[r]) of a uint8 buffer
    into int64 in one native pass (csrc parse_ints) — no padded
    digit-matrix intermediate.  Returns None when the native library is
    missing or any row is anomalous (empty/non-digit/too long); the
    caller falls back to the checked numpy path for exact
    FormatException semantics."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    out = np.empty(len(starts), dtype=np.int64)
    status = lib.parse_ints(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(starts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if status != 0:
        return None
    return out


def find_positions(buf: np.ndarray, value_a: int,
                   value_b: int = None) -> np.ndarray:
    """Positions of bytes equal to value_a (or value_b) in a contiguous
    uint8 buffer, as int64 — the SIMD twin of
    np.flatnonzero((buf == a) | (buf == b)), ~10x faster than the
    elementwise compare chain on a bandwidth-throttled host.  Falls
    back to numpy when the native library is missing."""
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    if value_b is None:
        value_b = value_a
    if lib is None:
        if value_a == value_b:
            return np.flatnonzero(buf == value_a).astype(np.int64)
        return np.flatnonzero((buf == value_a)
                              | (buf == value_b)).astype(np.int64)
    p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.count_two_bytes(p, len(buf), value_a, value_b)
    out = np.empty(n, dtype=np.int64)
    lib.find_two_bytes(p, len(buf), value_a, value_b,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def copy_2bit_shifted(src: np.ndarray, n_bases: int, dst: np.ndarray,
                      dst_base_off: int) -> bool:
    """Append a 2-bit-packed stream (src, from base 0) into dst at base
    offset dst_base_off.  Streams must append left-to-right (bytes past
    the first touched byte are overwritten).  False when the native
    library is missing."""
    lib = _load()
    if lib is None:
        return False
    lib.copy_2bit_shifted(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_bases),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(dst_base_off))
    return True


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """4 codes/byte little-endian pack; len(codes) must be a multiple
    of 4."""
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    assert len(codes) % 4 == 0
    if lib is None:
        return (codes[0::4] | (codes[1::4] << 2) | (codes[2::4] << 4)
                | (codes[3::4] << 6))
    out = np.empty(len(codes) // 4, dtype=np.uint8)
    lib.pack_2bit(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  len(codes),
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
