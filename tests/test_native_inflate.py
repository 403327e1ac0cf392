"""Native libdeflate-style gzip decoder (csrc/inflate.cpp) vs zlib
(reference hook it replaces: bionumpy/io/gzip_reading.py:1-4)."""
import glob
import gzip
import io as _io
import zlib

import numpy as np
import pytest

from bionumpy_tpu import native


def _gz(payload: bytes, level=6) -> bytes:
    b = _io.BytesIO()
    with gzip.GzipFile(fileobj=b, mode="wb", compresslevel=level) as f:
        f.write(payload)
    return b.getvalue()


def _zlib_all(comp: bytes) -> bytes:
    out, rest = b"", comp
    while rest:
        o = zlib.decompressobj(wbits=31)
        out += o.decompress(rest)
        rest = o.unused_data
    return out


pytestmark = pytest.mark.skipif(not native.has_native(),
                                reason="native library not built")


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_levels_random_and_text(level):
    rng = np.random.default_rng(level)
    for payload in (rng.integers(0, 256, 100_000, np.uint8).tobytes(),
                    b"ACGTACGGTTAA\n" * 20_000, b"", b"x"):
        comp = _gz(payload, level)
        assert native.gzip_inflate(comp) == payload


def test_every_reference_gz_file():
    for p in glob.glob("/root/reference/example_data/*.gz"):
        comp = open(p, "rb").read()
        assert native.gzip_inflate(comp) == _zlib_all(comp), p


def test_multimember_and_fname_flags():
    # gzip.GzipFile(filename=...) sets FNAME; mtime field exercised too
    b = _io.BytesIO()
    with gzip.GzipFile("reads.fq", fileobj=b, mode="wb", mtime=12345) as f:
        f.write(b"hello world")
    comp = b.getvalue() + _gz(b"second" * 100, 9) + _gz(b"", 0)
    assert native.gzip_inflate(comp) == b"hello world" + b"second" * 100


def test_errors_and_fuzz():
    real = open("/root/reference/example_data/big.fq.gz", "rb").read()
    with pytest.raises(zlib.error):
        native.gzip_inflate(real[:-30])  # truncated
    bad = real[:-6] + b"\x00" + real[-5:]  # corrupt trailer
    with pytest.raises(zlib.error):
        native.gzip_inflate(bad)
    rng = np.random.default_rng(7)
    base = _gz(b"ACGT" * 5000, 6)
    exp = b"ACGT" * 5000
    for _ in range(100):
        mut = bytearray(base)
        mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
        try:
            out = native.gzip_inflate(bytes(mut))
        except zlib.error:
            continue
        # a corruption that still decodes must at least be SOME output
        assert isinstance(out, bytes)


def test_growth_retry_small_hint():
    payload = b"A" * 1_000_000  # ratio >> 4: forces the retry loop
    comp = _gz(payload, 9)
    assert native.gzip_inflate(comp) == payload


def test_pgzip_uses_native_and_matches(tmp_path):
    from bionumpy_tpu.io import pgzip
    payloads = [b"@r%d\nACGT\n+\nIIII\n" % i * 50 for i in range(5)]
    data = b"".join(_gz(p) for p in payloads)
    parts = pgzip.inflate_members(data, n_threads=2)
    assert b"".join(parts) == b"".join(payloads)
