"""Member-table slab ingest (pipeline._batch_arrays): the fast path,
the pigz-style carry path, and the generic fallback must all yield the
same entry-aligned content and identical k-mer counts."""
import gzip

import numpy as np
import pytest

from concurrent.futures import ThreadPoolExecutor

from bionumpy_tpu.pipeline import (_batch_arrays, _member_table,
                                   count_kmers_fastq)

BIG = "/root/reference/example_data/big.fq.gz"


@pytest.fixture(scope="module")
def layouts(tmp_path_factory):
    """One logical FASTQ (5x big.fq) in three gzip layouts."""
    d = tmp_path_factory.mktemp("ingest")
    member = open(BIG, "rb").read()
    full = gzip.decompress(member) * 5
    multi = d / "multi.fq.gz"          # record-aligned members
    multi.write_bytes(member * 5)
    pigz = d / "pigz.fq.gz"            # members cut mid-record (64 KB)
    with open(pigz, "wb") as f:
        for i in range(0, len(full), 64 * 1024):
            f.write(gzip.compress(full[i: i + 64 * 1024], 5, mtime=0))
    single = d / "single.fq.gz"        # one member: generic path
    single.write_bytes(gzip.compress(full, 5, mtime=0))
    return full, {"multi": str(multi), "pigz": str(pigz),
                  "single": str(single)}


@pytest.mark.parametrize("layout", ["multi", "pigz", "single"])
@pytest.mark.parametrize("target", [1 << 19, 1 << 30])
def test_batches_are_entry_aligned_and_complete(layouts, layout, target):
    full, paths = layouts
    pool = ThreadPoolExecutor(2)
    out = []
    try:
        for b in _batch_arrays(paths[layout], target, pool):
            arr = b if isinstance(b, np.ndarray) \
                else np.frombuffer(b, np.uint8)
            assert arr[-1] == 10
            assert int((arr == 10).sum()) % 4 == 0
            out.append(arr.tobytes())
    finally:
        pool.shutdown(wait=False)
    assert b"".join(out) == full


def test_counts_identical_across_layouts(layouts):
    _, paths = layouts
    tables = []
    for path in paths.values():
        counts, stats = count_kmers_fastq(path, 31, cap=1 << 18,
                                          target_bases=1 << 19,
                                          device_parse=False)
        assert stats["n_reads"] == 5000
        tables.append((counts.label_codes.tolist(),
                       counts.counts.tolist()))
    assert tables[0] == tables[1] == tables[2]


def test_member_table_reads_isize(layouts):
    _, paths = layouts
    data = open(paths["multi"], "rb").read()
    tbl = _member_table(data)
    assert tbl is not None
    bounds, isz = tbl
    assert len(isz) == 5
    raw_len = len(gzip.decompress(open(BIG, "rb").read()))
    assert all(int(s) == raw_len for s in isz)
    # single-member files have no table
    assert _member_table(open(paths["single"], "rb").read()) is None


def test_corrupt_isize_fails_loudly(layouts, tmp_path):
    """A corrupted ISIZE footer makes the fast path fall back, and the
    repairing path then raises (the reference's gzip reader also
    refuses an ISIZE mismatch) — never silent wrong content."""
    import zlib
    _, paths = layouts
    data = bytearray(open(paths["multi"], "rb").read())
    tbl = _member_table(bytes(data))
    first_end = int(tbl[0][1])
    data[first_end - 4: first_end] = (123456789).to_bytes(4, "little")
    bad = tmp_path / "bad_isize.fq.gz"
    bad.write_bytes(bytes(data))
    pool = ThreadPoolExecutor(2)
    try:
        with pytest.raises(zlib.error):
            for _ in _batch_arrays(str(bad), 1 << 19, pool):
                pass
    finally:
        pool.shutdown(wait=False)


def test_implausible_isize_rejects_member_table(layouts):
    """A footer claiming >64x expansion must disqualify the member
    table BEFORE any slab allocation (ADVICE r3: a corrupt/adversarial
    ISIZE could otherwise drive multi-GB np.empty calls)."""
    _, paths = layouts
    data = bytearray(open(paths["multi"], "rb").read())
    tbl = _member_table(bytes(data))
    assert tbl is not None
    first_end = int(tbl[0][1])
    claimed = 64 * first_end + (1 << 20)  # just past the per-member cap
    data[first_end - 4: first_end] = claimed.to_bytes(4, "little")
    assert _member_table(bytes(data)) is None


def test_member_zero_probe_reused(layouts):
    """The ratio probe's member-0 bytes are copied into batch 0 instead
    of being inflated twice (ADVICE r3); content stays identical."""
    from unittest import mock
    from bionumpy_tpu import pipeline
    full, paths = layouts
    calls = []
    real = pipeline._inflate_member_into

    def spy(data, start, end, slab, off, expect):
        calls.append(start)
        return real(data, start, end, slab, off, expect)

    pool = ThreadPoolExecutor(2)
    try:
        with mock.patch.object(pipeline, "_inflate_member_into", spy):
            out = b"".join(
                bytes(b) if isinstance(b, np.ndarray) else b
                for b in pipeline._batch_arrays(paths["multi"], 1 << 30,
                                                pool))
    finally:
        pool.shutdown(wait=False)
    assert out == full
    assert calls.count(0) == 1  # probe only; not re-inflated into slab


def test_fused_parse_matches_raw_parse(layouts):
    """The fused member-parse ingest (fused_parse=True) yields the same
    parsed batches as _parse_batch over the raw slab path for an
    entry-aligned layout, and falls back transparently for pigz-style
    members cut mid-record."""
    from bionumpy_tpu.pipeline import _parse_batch
    full, paths = layouts
    for layout in ("multi", "pigz"):
        pool = ThreadPoolExecutor(2)
        try:
            raw_batches = [
                _parse_batch(b) for b in _batch_arrays(
                    paths[layout], 1 << 19, ThreadPoolExecutor(2))]
            fused_batches = [
                _parse_batch(b) for b in _batch_arrays(
                    paths[layout], 1 << 19, pool, fused_parse=True)]
        finally:
            pool.shutdown(wait=False)
        assert len(raw_batches) == len(fused_batches)
        for (w1, e1, nb1, nr1), (w2, e2, nb2, nr2) in zip(
                raw_batches, fused_batches):
            assert (nb1, nr1) == (nb2, nr2)
            np.testing.assert_array_equal(w1, w2)
            np.testing.assert_array_equal(e1, e2)


def test_fused_counts_identical(layouts):
    """count_kmers_fastq over the fused ingest equals the generic
    layouts' counts (the fused path is its default for aligned
    files)."""
    _, paths = layouts
    c1, s1 = count_kmers_fastq(paths["multi"], 31, cap=1 << 18,
                               target_bases=1 << 19)
    c2, s2 = count_kmers_fastq(paths["single"], 31, cap=1 << 18,
                               target_bases=1 << 19)
    assert s1["n_kmers"] == s2["n_kmers"]
    assert np.array_equal(c1.label_codes, c2.label_codes)
    assert np.array_equal(c1.counts, c2.counts)
