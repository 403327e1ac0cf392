"""Parallel multi-member gzip inflation (bionumpy_tpu/io/pgzip.py).

Extends the reference's gzip hook (bionumpy/io/gzip_reading.py:1-4) with
pool inflation of concatenated members; these tests pin boundary
detection, false-positive repair, the file-like wrapper, and integration
with bnp.open."""
import gzip
import io as _io
import zlib

import numpy as np
import pytest

from bionumpy_tpu.io import pgzip

PAYLOADS = [b"@r1\nACGT\n+\nIIII\n" * 50,
            b"@r2\nGGGG\n+\nIIII\n" * 30,
            b"@r3\nTTTT\n+\nIIII\n" * 70]


def _gz(payload: bytes) -> bytes:
    buf = _io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb") as f:
        f.write(payload)
    return buf.getvalue()


@pytest.fixture
def multi():
    members = [_gz(p) for p in PAYLOADS]
    return b"".join(members), members


def test_member_offsets(multi):
    data, members = multi
    offsets = pgzip.member_offsets(data)
    expected = np.cumsum([0] + [len(m) for m in members[:-1]])
    assert set(expected).issubset(set(offsets.tolist()))
    assert offsets[0] == 0


def test_inflate_members(multi):
    data, _ = multi
    parts = pgzip.inflate_members(data, n_threads=3)
    assert b"".join(parts) == b"".join(PAYLOADS)


def test_single_member_stream():
    data = _gz(PAYLOADS[0])
    parts = pgzip.inflate_members(data)
    assert b"".join(parts) == PAYLOADS[0]


def test_false_positive_boundary_repair():
    # embed the gzip magic INSIDE a member's compressed payload by
    # brute-forcing an uncompressible payload containing it after
    # compression with level 0 (stored blocks copy bytes verbatim)
    payload = b"x" * 10 + bytes([0x1F, 0x8B, 0x08, 0x00]) * 3 + b"y" * 10
    buf = _io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=0) as f:
        f.write(payload)
    member = buf.getvalue()
    data = member + _gz(PAYLOADS[1])
    offsets = pgzip.member_offsets(data)
    assert len(offsets) > 2  # the embedded magic produced false positives
    parts = pgzip.inflate_members(data, offsets)
    assert b"".join(parts) == payload + PAYLOADS[1]
    # and through the streaming wrapper
    stream = pgzip._ParallelMemberStream(data, offsets, n_threads=2,
                                         window=2)
    assert stream.read() == payload + PAYLOADS[1]


def test_stream_chunked_reads(multi):
    data, _ = multi
    stream = pgzip._ParallelMemberStream(
        data, pgzip.member_offsets(data), n_threads=2, window=2)
    out = bytearray()
    while True:
        chunk = stream.read(37)
        if not chunk:
            break
        out += chunk
    assert bytes(out) == b"".join(PAYLOADS)
    stream.close()


def test_open_gzip_multimember(tmp_path):
    path = tmp_path / "multi.fq.gz"
    path.write_bytes(b"".join(_gz(p) for p in PAYLOADS))
    f = pgzip.open_gzip(str(path))
    # small plausible members materialize into one parallel-inflated
    # buffer; the streaming member window remains the fallback
    assert f.read() == b"".join(PAYLOADS)
    # an implausible ISIZE table must still stream (and stay exact)
    data = bytearray(path.read_bytes())
    data[-4:] = (123456789).to_bytes(4, "little")
    bad = path.parent / "bad_tail.fq.gz"
    bad.write_bytes(bytes(data))
    g = pgzip.open_gzip(str(bad))
    assert isinstance(g, pgzip._ParallelMemberStream)


def test_open_gzip_single_member_falls_back(tmp_path):
    path = tmp_path / "single.fq.gz"
    path.write_bytes(_gz(PAYLOADS[0]))
    f = pgzip.open_gzip(str(path))
    assert f.read() == PAYLOADS[0]


def test_bnp_open_reads_multimember(tmp_path):
    import bionumpy_tpu as bnp
    path = tmp_path / "reads.fq.gz"
    path.write_bytes(b"".join(_gz(p) for p in PAYLOADS))
    data = bnp.open(str(path)).read()
    n_expected = sum(p.count(b"@") for p in PAYLOADS)
    assert len(data) == n_expected


def test_readline_and_backward_seek(multi):
    # the header readers iterate lines then seek back past the first
    # non-comment line (io/file_buffers.py read_header)
    data, _ = multi
    stream = pgzip._ParallelMemberStream(
        data, pgzip.member_offsets(data), n_threads=2)
    line1 = stream.readline()
    assert line1 == b"@r1\nACGT\n+\nIIII\n".splitlines(True)[0]
    line2 = stream.readline()
    stream.seek(-len(line2), 1)
    assert stream.readline() == line2
    assert stream.tell() == len(line1) + len(line2)
    rest = stream.read()
    assert line1 + line2 + rest == b"".join(PAYLOADS)


def test_truncated_raises(multi):
    data, _ = multi
    with pytest.raises(zlib.error):
        pgzip.inflate_members(data[:-30])
