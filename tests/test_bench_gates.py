"""The perf harness's exact-output gates, extracted to CPU-runnable
tests (VERDICT r3 item 9): every validation bench.py applies to a timed
config runs here on small inputs, so refactoring the harness cannot
silently weaken the perf evidence.  The numpy twins under test are
bench.py's own (imported, not copied)."""
import gzip as _gz
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (the harness under test)

MEMBER = open(bench.FASTQ, "rb").read()


@pytest.fixture(scope="module")
def small_diverse(tmp_path_factory):
    """A scaled-down diverse bench file: 4 mutated variants x 2 copies,
    with its exact expected 31-mer table (bench's construction at
    1/256 scale)."""
    raw = np.frombuffer(zlib.decompress(MEMBER, wbits=31), np.uint8)
    nl = np.flatnonzero(raw == 10)
    starts = np.insert(nl[:-1] + 1, 0, 0)
    s_starts = starts[1::4]
    s_lens = (nl[1::4] - s_starts).astype(np.int64)
    seq_idx = np.repeat(
        s_starts - np.insert(np.cumsum(s_lens)[:-1], 0, 0),
        s_lens) + np.arange(int(s_lens.sum()), dtype=np.int64)
    n_variants, copies = 4, 2
    path = tmp_path_factory.mktemp("bench") / "small_diverse.fq.gz"
    members = []
    with open(path, "wb") as f:
        for v in range(n_variants):
            mut = bench._mutate_member(raw, seq_idx, v)
            comp = _gz.compress(mut, compresslevel=6, mtime=0)
            members.extend([comp] * copies)
            for _ in range(copies):
                f.write(comp)
    return str(path), members


def test_gate_config1_composition(small_diverse):
    """Composition totals from the packed device path equal the numpy
    parse+bincount twin (bench.config1's gate)."""
    import jax
    from concurrent.futures import ThreadPoolExecutor
    from bionumpy_tpu.ops.seq import composition_from_packed
    from bionumpy_tpu.pipeline import _batch_arrays, _parse_batch

    path, members = small_diverse
    totals = np.zeros(4, np.int64)
    pool = ThreadPoolExecutor(2)
    try:
        for raw in _batch_arrays(path, 1 << 18, pool):
            words, ends, nb, nr = _parse_batch(raw)
            out = composition_from_packed(jax.numpy.asarray(words), nb)
            totals += np.asarray(out).astype(np.int64)
    finally:
        pool.shutdown(wait=False)
    expected = np.zeros(4, np.int64)
    for comp in members:
        r = np.frombuffer(zlib.decompress(comp, wbits=31), np.uint8)
        codes, _ = bench.numpy_parse_fastq(r)
        expected += np.bincount(codes, minlength=4)
    np.testing.assert_array_equal(totals, expected)


def test_gate_config2_pipeline_table(small_diverse):
    """The flagship pipeline's full (hash, count) table equals
    bench.numpy_whole_job on the same members (the headline gate)."""
    from bionumpy_tpu.pipeline import count_kmers_fastq
    path, members = small_diverse
    counts, stats = count_kmers_fastq(path, bench.K, cap=1 << 17,
                                      target_bases=100_000,
                                      device_parse=False)
    exp_h, exp_c = bench.numpy_whole_job(members, bench.K)
    np.testing.assert_array_equal(counts.label_codes, exp_h)
    np.testing.assert_array_equal(counts.counts, exp_c)
    assert stats["n_kmers"] == int(exp_c.sum())


def test_gate_config3_minimizer_table_and_gc():
    """count_minimizers + gc_track equal bench.numpy_minimizer_job and
    the reduceat GC twin (bench.config3's gate), on synthetic strains."""
    import bionumpy_tpu as bnp
    from bionumpy_tpu.ops.tracks import gc_track
    from bionumpy_tpu.sequence import count_minimizers

    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, 40_000).astype(np.uint8)
    strains = [base]
    for v in range(1, 3):
        mut = base.copy()
        pos = np.flatnonzero(rng.random(len(mut)) < 0.001)
        mut[pos] = (mut[pos] + rng.integers(1, 4, len(pos))) % 4
        strains.append(mut)
    flat = np.concatenate(strains)
    lengths = np.array([40_000] * 3)
    seqs = bnp.EncodedRaggedArray(
        bnp.EncodedArray(flat, bnp.DNAEncoding), lengths)
    k, w = 21, 30
    tbl = count_minimizers(seqs, k, w, cap=1 << 17)
    gc = gc_track(seqs, 1000)
    exp_h, exp_c = bench.numpy_minimizer_job(flat, lengths, k, w - k + 1)
    np.testing.assert_array_equal(tbl.label_codes, exp_h)
    np.testing.assert_array_equal(tbl.counts, exp_c)
    gc_exp = np.add.reduceat((flat == 1) | (flat == 2),
                             np.arange(0, len(flat), 1000))
    np.testing.assert_array_equal(gc, gc_exp)


def test_gate_config4_pwm_positions(small_diverse):
    """pwm_stream_job's (read, offset) match set equals
    bench.numpy_pwm_job (bench.config4's gate)."""
    from bionumpy_tpu.io.jaspar import read_jaspar_matrix
    path, members = small_diverse
    pwm = read_jaspar_matrix(
        "/root/reference/example_data/MA0080.1.jaspar")
    matrix32 = pwm.matrix.astype(np.float32)
    threshold = 28.0
    rows, offs, n_matches, n_bases, n_reads = bench.pwm_stream_job(
        path, matrix32, threshold, cap=1 << 16,
        target_bases=100_000)
    exp_rows, exp_offs = bench.numpy_pwm_job(members, matrix32,
                                             threshold)
    assert n_matches == len(exp_rows)
    got = np.lexsort((offs, rows))
    want = np.lexsort((exp_offs, exp_rows))
    np.testing.assert_array_equal(rows[got], exp_rows[want])
    np.testing.assert_array_equal(offs[got], exp_offs[want])


def test_gate_config5_binned_pileup():
    """get_pileup_device bins equal both the dense host recompute and
    the RLE pileup rebinned (bench.config5's gate)."""
    from bionumpy_tpu.arithmetics import get_pileup, get_pileup_device
    from bionumpy_tpu.datatypes import Interval

    rng = np.random.default_rng(11)
    size = 50_000
    bin_size = 1000
    starts = np.sort(rng.integers(0, size - 500, 400))
    stops = starts + rng.integers(1, 500, 400)
    ivals = Interval(["chr21"] * 400, starts, stops)
    dev_bins = np.asarray(get_pileup_device(ivals, size,
                                            bin_size=bin_size))
    diff = np.zeros(size + 1, np.int64)
    np.add.at(diff, starts, 1)
    np.add.at(diff, np.minimum(stops, size), -1)
    dense = np.cumsum(diff[:-1])
    pad = (-len(dense)) % bin_size
    exp_bins = np.concatenate([dense, np.zeros(pad, dense.dtype)]) \
        .reshape(-1, bin_size).sum(axis=-1)
    np.testing.assert_array_equal(dev_bins, exp_bins)
    rle = get_pileup(ivals, size)
    np.testing.assert_array_equal(
        dev_bins,
        np.concatenate([rle.to_array(),
                        np.zeros((-size) % bin_size, np.int64)])
        .reshape(-1, bin_size).sum(axis=-1))


def test_gate_half_file_table_consistency(small_diverse):
    """bench's half-file baseline check: the first half of a variant-
    grouped file merges to exactly the half-members table."""
    path, members = small_diverse
    half = members[: len(members) // 2]
    h_h, c_h = bench.numpy_whole_job(half, bench.K)
    full_h, full_c = bench.numpy_whole_job(members, bench.K)
    # half + half == full under the sorted-merge fold
    from bionumpy_tpu.pipeline import merge_sorted_tables
    h2, c2 = bench.numpy_whole_job(members[len(members) // 2:], bench.K)
    m_h, m_c = merge_sorted_tables(h_h, c_h, h2, c2)
    np.testing.assert_array_equal(m_h, full_h)
    np.testing.assert_array_equal(m_c, full_c)
