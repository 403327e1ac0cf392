"""End-to-end streamed FASTQ -> kmer-count pipeline (pipeline.py) vs the
layered count_kmers path (reference whole-job semantics:
/root/reference/benchmarks/rules/kmer_counting.smk:8-16)."""
import gzip
import io as _io

import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.pipeline import count_kmers_fastq

BIG_FQ = "/root/reference/example_data/big.fq.gz"


def _expected_counts(path, k):
    data = bnp.open(path).read()
    seqs = bnp.change_encoding(data.sequence, bnp.DNAEncoding)
    return bnp.count_kmers(seqs, k)


@pytest.mark.parametrize("k", [31, 15])
def test_matches_count_kmers_on_big_fq(k):
    counts, stats = count_kmers_fastq(BIG_FQ, k)
    expected = _expected_counts(BIG_FQ, k)
    assert np.array_equal(counts.label_codes, expected.label_codes)
    assert np.array_equal(counts.counts, expected.counts)
    assert stats["n_reads"] == 1000
    assert stats["n_kmers"] == int(expected.counts.sum())


def test_multimember_and_batching(tmp_path):
    # several members, forced small batches -> multiple device batches
    member = open(BIG_FQ, "rb").read()
    path = tmp_path / "multi.fq.gz"
    path.write_bytes(member * 5)
    counts, stats = count_kmers_fastq(str(path), 31,
                                      target_bases=200_000)
    expected = _expected_counts(BIG_FQ, 31)
    assert np.array_equal(counts.label_codes, expected.label_codes)
    assert np.array_equal(counts.counts, expected.counts * 5)
    assert stats["n_reads"] == 5000


def test_plain_fastq(tmp_path):
    raw = gzip.decompress(open(BIG_FQ, "rb").read())
    path = tmp_path / "reads.fq"
    path.write_bytes(raw)
    counts, _ = count_kmers_fastq(str(path), 31, target_bases=100_000)
    expected = _expected_counts(BIG_FQ, 31)
    assert np.array_equal(counts.counts, expected.counts)


def test_entry_carry_across_parts():
    from bionumpy_tpu.pipeline import _cut_parts
    entry = b"@r\nACGTACGT\n+\nIIIIIIII\n"
    raw = entry * 100
    # part sizes that never align with the 23-byte entry
    for size in (7, 37, 100, 23 * 3):
        parts = [raw[i: i + size] for i in range(0, len(raw), size)]
        nl = [p.count(b"\n") for p in parts]
        out = []
        acc, acc_nl = [], []
        for p, c in zip(parts, nl):
            acc.append(p)
            acc_nl.append(c)
            batch, acc, acc_nl = _cut_parts(acc, acc_nl)
            if batch:
                out.append(batch)
            assert acc_nl == [p.count(b"\n") for p in acc]
        out += ["".encode().join(acc)]
        assert b"".join(out) == raw
        for b in out[:-1]:
            assert b.startswith(b"@") and b.endswith(b"\n")
            assert b.count(b"\n") % 4 == 0


def test_truncated_raises(tmp_path):
    raw = gzip.decompress(open(BIG_FQ, "rb").read())[:-40]
    path = tmp_path / "trunc.fq"
    path.write_bytes(raw)
    with pytest.raises(ValueError):
        count_kmers_fastq(str(path), 31)


def test_instrument_stages_recorded():
    from bionumpy_tpu import instrument
    instrument.reset()
    count_kmers_fastq(BIG_FQ, 31)
    rep = instrument.report()
    # fused ingest: inflate+parse and stitch replace the raw slab's
    # separate inflate / parse+pack stages; there is NO D2H-meta stage
    # any more — per-batch metas fold on device and ride the final
    # table fetch (r5)
    for name in ("read", "inflate+parse", "stitch", "H2D", "dispatch",
                 "device-merge", "D2H-table"):
        assert name in rep, (name, rep)
    assert "D2H-meta" not in rep, rep
    assert instrument.summary(total=1.0)
    instrument.reset()


@pytest.mark.parametrize("mode", [True, "auto"])
def test_device_parse_paths_match(tmp_path, mode):
    """The fused parse-on-device transport and the adaptive chooser give
    identical counts to the packed-host-parse path."""
    member = open(BIG_FQ, "rb").read()
    path = tmp_path / "multi.fq.gz"
    path.write_bytes(member * 4)
    expected, _ = count_kmers_fastq(str(path), 31, target_bases=150_000,
                                    device_parse=False)
    got, stats = count_kmers_fastq(str(path), 31, target_bases=150_000,
                                   device_parse=mode)
    assert np.array_equal(got.label_codes, expected.label_codes)
    assert np.array_equal(got.counts, expected.counts)
    assert stats["n_reads"] == 4000
    assert stats["n_bases"] == 4 * 217598


def test_diverse_bench_input_machinery(tmp_path):
    """bench.py's mutated-variant generator: deterministic, valid ACGT,
    and the pipeline's counts equal the independent numpy whole job."""
    import gzip as _gz
    import sys
    sys.path.insert(0, "/root/repo")
    import bench

    member = open(BIG_FQ, "rb").read()
    raw = np.frombuffer(_gz.decompress(member), np.uint8)
    nl = np.flatnonzero(raw == 10)
    starts = np.insert(nl[:-1] + 1, 0, 0)
    s_starts = starts[1::4]
    s_lens = (nl[1::4] - s_starts).astype(np.int64)
    seq_idx = np.repeat(
        s_starts - np.insert(np.cumsum(s_lens)[:-1], 0, 0),
        s_lens) + np.arange(int(s_lens.sum()), dtype=np.int64)

    v1 = bench._mutate_member(raw, seq_idx, 3)
    v1b = bench._mutate_member(raw, seq_idx, 3)
    v2 = bench._mutate_member(raw, seq_idx, 4)
    assert v1 == v1b and v1 != v2  # deterministic per variant
    arr = np.frombuffer(v1, np.uint8)
    assert np.isin(arr[seq_idx], np.frombuffer(b"ACGT", np.uint8)).all()
    frac = (arr[seq_idx] != raw[seq_idx]).mean()
    assert 0.005 < frac < 0.012  # ~1% minus same-base collisions

    # small multi-variant file: pipeline == numpy whole job
    members = [_gz.compress(bench._mutate_member(raw, seq_idx, v),
                            compresslevel=1, mtime=0) for v in range(3)]
    path = tmp_path / "div.fq.gz"
    path.write_bytes(b"".join(m * 2 for m in members))
    counts, stats = count_kmers_fastq(str(path), 31,
                                      target_bases=300_000,
                                      device_parse=False)
    exp_h, exp_c = bench.numpy_whole_job(
        [m for m in members for _ in range(2)], 31)
    assert np.array_equal(counts.label_codes, exp_h)
    assert np.array_equal(counts.counts, exp_c)
    assert stats["n_reads"] == 6000


def test_many_batches_device_fold(tmp_path):
    """>FOLD_EVERY batches exercises the intermediate device fold that
    bounds HBM for long streams."""
    member = open(BIG_FQ, "rb").read()
    path = tmp_path / "many.fq.gz"
    path.write_bytes(member * 5)
    counts, stats = count_kmers_fastq(str(path), 31, target_bases=50_000,
                                      device_parse=False)
    expected = _expected_counts(BIG_FQ, 31)
    assert np.array_equal(counts.label_codes, expected.label_codes)
    assert np.array_equal(counts.counts, expected.counts * 5)
    assert stats["n_reads"] == 5000


def test_cap_overflow_retries_batch(tmp_path):
    """A batch with more distinct kmers than `cap` is recounted at a
    doubled cap instead of dying after the job (VERDICT r2 item 6)."""
    rng = np.random.default_rng(7)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 120))
            for _ in range(40)]  # ~3600 distinct 31-mers
    raw = "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                  for i, s in enumerate(seqs)).encode()
    path = tmp_path / "dense.fq"
    path.write_bytes(raw)
    got, stats = count_kmers_fastq(str(path), 31, cap=256,
                                   acc_cap=1 << 13)
    exp, stats2 = count_kmers_fastq(str(path), 31, cap=1 << 13,
                                    acc_cap=1 << 13)
    assert int(exp.counts.sum()) == stats2["n_kmers"]
    assert np.array_equal(got.label_codes, exp.label_codes)
    assert np.array_equal(got.counts, exp.counts)
    assert stats["n_kmers"] == stats2["n_kmers"]


def test_acc_overflow_raises(tmp_path):
    rng = np.random.default_rng(8)
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, 4000))
    raw = f"@r\n{s}\n+\n{'I' * len(s)}\n".encode()
    path = tmp_path / "wide.fq"
    path.write_bytes(raw)
    with pytest.raises(ValueError, match="acc_cap"):
        count_kmers_fastq(str(path), 31, cap=1 << 13, acc_cap=2048)


def test_spill_to_host_table(tmp_path, monkeypatch):
    """Total counts past _SPILL_LIMIT fold through the host int64 table
    (guards merge_hash_tables' int32 cumsum; ADVICE r2)."""
    import bionumpy_tpu.pipeline as pl
    member = open(BIG_FQ, "rb").read()
    path = tmp_path / "multi.fq.gz"
    path.write_bytes(member * 4)
    monkeypatch.setattr(pl, "_SPILL_LIMIT", 100_000)
    counts, stats = count_kmers_fastq(str(path), 31,
                                      target_bases=100_000)
    expected = _expected_counts(BIG_FQ, 31)
    assert np.array_equal(counts.label_codes, expected.label_codes)
    assert np.array_equal(counts.counts, expected.counts * 4)


def test_mesh_path_matches_single_device(tmp_path):
    """count_kmers_fastq(mesh=...) on the virtual 8-device CPU mesh
    equals the single-device counts (VERDICT r2 item 4)."""
    import jax
    from bionumpy_tpu.parallel import create_mesh
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(8)
    member = open(BIG_FQ, "rb").read()
    path = tmp_path / "multi.fq.gz"
    path.write_bytes(member * 3)
    got, stats = count_kmers_fastq(str(path), 31, cap=1 << 17,
                                   target_bases=100_000, mesh=mesh)
    expected = _expected_counts(BIG_FQ, 31)
    assert np.array_equal(got.label_codes, expected.label_codes)
    assert np.array_equal(got.counts, expected.counts * 3)
    assert stats["n_reads"] == 3000


def test_split_fastq_entries():
    from bionumpy_tpu.pipeline import _split_fastq_entries
    entry = b"@r%d\nACGTACGTXX\n+\nIIIIIIIIII\n"
    raw = b"".join(entry % i for i in range(103))
    for n in (1, 2, 3, 8, 16):
        parts = _split_fastq_entries(raw, n)
        assert len(parts) == n
        assert b"".join(parts) == raw
        for p in parts:
            assert p.count(b"\n") % 4 == 0
            if p:
                assert p.startswith(b"@r")
    # tiny input, many shards -> empty tails allowed
    parts = _split_fastq_entries(entry % 0, 8)
    assert b"".join(parts) == entry % 0
    assert sum(1 for p in parts if p) == 1


def test_pwm_stream_job_matches_numpy(tmp_path):
    """bench config4's streamed whole-job PWM scan == the numpy twin."""
    import gzip as _gz
    import sys
    sys.path.insert(0, "/root/repo")
    import bench
    from bionumpy_tpu.io.jaspar import read_jaspar_matrix

    member = open(BIG_FQ, "rb").read()
    path = tmp_path / "multi.fq.gz"
    path.write_bytes(member * 3)
    pwm = read_jaspar_matrix(
        "/root/reference/example_data/MA0080.1.jaspar")
    m32 = pwm.matrix.astype(np.float32)
    rows, offs, n_matches, n_bases, n_reads = bench.pwm_stream_job(
        str(path), m32, 6.0, target_bases=150_000)
    assert n_reads == 3000 and n_bases == 3 * 217598
    exp_rows, exp_offs = bench.numpy_pwm_job([member] * 3, m32, 6.0)
    assert n_matches == len(exp_rows) > 0
    got = np.lexsort((offs, rows))
    exp = np.lexsort((exp_offs, exp_rows))
    assert np.array_equal(rows[got], exp_rows[exp])
    assert np.array_equal(offs[got], exp_offs[exp])


def test_count_minimizers_matches_numpy_job():
    """bench config3's sparse table == the independent numpy twin."""
    import sys
    sys.path.insert(0, "/root/repo")
    import bench
    import bionumpy_tpu as bnp
    from bionumpy_tpu.sequence import count_minimizers

    rng = np.random.default_rng(5)
    lengths = np.array([500, 37, 80, 1000])
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    seqs = bnp.EncodedRaggedArray(
        bnp.EncodedArray(flat, bnp.DNAEncoding), lengths)
    tbl = count_minimizers(seqs, 21, 30)
    exp_h, exp_c = bench.numpy_minimizer_job(flat, lengths, 21, 10)
    assert np.array_equal(tbl.label_codes, exp_h)
    assert np.array_equal(tbl.counts, exp_c)


def test_device_parse_rejects_non_acgt(tmp_path):
    """Both transports fail loudly on N-containing FASTQ (ADVICE r2:
    device-parse used to silently drop N-containing windows)."""
    raw = b"@r\nACGTNACGTACGTACGTACGTACGTACGTACGTACGT\n+\n" + \
        b"I" * 37 + b"\n"
    path = tmp_path / "n.fq"
    path.write_bytes(raw)
    with pytest.raises(ValueError):
        count_kmers_fastq(str(path), 31, device_parse=True)
    with pytest.raises(ValueError):
        count_kmers_fastq(str(path), 31, device_parse=False)


@pytest.mark.parametrize("content,k,expect_reads", [
    (b"", 31, 0),                                      # empty member
    (b"@r1\nACGTACGT\n+\nIIIIIIII", 5, 1),             # no trailing \n
    (b"@r1\nACGTACGTACGT\n+\nIIIIIIIIIIII\n", 5, 1),
])
def test_ingest_edge_files(tmp_path, content, k, expect_reads):
    """Tiny/degenerate gzip inputs flow through the overlapped reader +
    fused parse without special-casing by the caller."""
    import gzip
    p = tmp_path / "edge.fq.gz"
    p.write_bytes(gzip.compress(content))
    counts, stats = count_kmers_fastq(str(p), k, cap=1 << 10)
    assert stats["n_reads"] == expect_reads


def test_ingest_zero_byte_file(tmp_path):
    p = tmp_path / "zero.fq.gz"
    p.write_bytes(b"")
    counts, stats = count_kmers_fastq(str(p), 31, cap=1 << 10)
    assert stats == {"n_reads": 0, "n_bases": 0, "n_kmers": 0}
