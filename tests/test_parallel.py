import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh8():
    from bionumpy_tpu.parallel import create_mesh
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(8)


def test_parallel_count_matches_host(mesh8):
    from bionumpy_tpu.parallel import parallel_count_kmers
    from bionumpy_tpu.parallel.kmer_parallel import shard_flat_codes
    rng = np.random.default_rng(3)
    lengths = rng.integers(10, 50, 200)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    k = 4
    codes, dist = shard_flat_codes(flat, lengths, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    codes_s = jax.device_put(jnp.asarray(codes),
                             NamedSharding(mesh8, P("dp", None)))
    dist_s = jax.device_put(jnp.asarray(dist),
                            NamedSharding(mesh8, P("dp", None)))
    counts = np.asarray(parallel_count_kmers(mesh8, codes_s, dist_s, k,
                                             4 ** k))
    # host reference
    offsets = np.insert(np.cumsum(lengths), 0, 0)
    expected = np.zeros(4 ** k, dtype=np.int64)
    powers = 4 ** np.arange(k, dtype=np.int64)
    for r in range(len(lengths)):
        row = flat[offsets[r]: offsets[r + 1]].astype(np.int64)
        for i in range(max(0, len(row) - k + 1)):
            expected[int((row[i: i + k] * powers).sum())] += 1
    np.testing.assert_array_equal(counts, expected)


def test_parallel_composition(mesh8):
    from bionumpy_tpu.parallel import parallel_composition
    from bionumpy_tpu.parallel.kmer_parallel import shard_flat_codes
    rng = np.random.default_rng(9)
    lengths = rng.integers(5, 30, 100)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    codes, dist = shard_flat_codes(flat, lengths, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    codes_s = jax.device_put(jnp.asarray(codes),
                             NamedSharding(mesh8, P("dp", None)))
    dist_s = jax.device_put(jnp.asarray(dist),
                            NamedSharding(mesh8, P("dp", None)))
    comp = np.asarray(parallel_composition(mesh8, codes_s, dist_s))
    np.testing.assert_array_equal(comp, np.bincount(flat, minlength=4))


def test_dryrun_entry():
    import __graft_entry__ as graft
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert int(out[0]) > 0


def test_dryrun_multichip():
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


def test_file_sharding_partitions_records(example_data, tmp_path):
    import gzip, shutil
    from bionumpy_tpu.parallel.file_sharding import (read_shard,
                                                     shard_byte_ranges)
    import bionumpy_tpu as bnp
    # decompress big.fq.gz (byte-range sharding needs a plain file)
    fq = tmp_path / "big.fq"
    with gzip.open(example_data / "big.fq.gz", "rb") as src, \
            open(fq, "wb") as dst:
        shutil.copyfileobj(src, dst)
    full = bnp.open(str(fq)).read()
    ranges = shard_byte_ranges(str(fq), 4, "fastq")
    assert len(ranges) == 4
    shards = [read_shard(str(fq), r) for r in ranges]
    assert sum(len(s) for s in shards) == len(full)
    names = [n for s in shards for n in s.name.tolist()]
    assert names == full.name.tolist()
    seqs = [q for s in shards for q in s.sequence.tolist()]
    assert seqs == full.sequence.tolist()


def test_file_sharding_bed(example_data, tmp_path):
    from bionumpy_tpu.parallel.file_sharding import (read_shard,
                                                     shard_byte_ranges)
    import bionumpy_tpu as bnp
    import shutil
    bed = tmp_path / "t.bed"
    shutil.copy(example_data / "small_interval.bed", bed)
    full = bnp.open(str(bed)).read()
    ranges = shard_byte_ranges(str(bed), 3, "lines")
    shards = [read_shard(str(bed), r) for r in ranges]
    total = sum(len(s) for s in shards)
    assert total == len(full)
    starts = np.concatenate([np.asarray(s.start) for s in shards
                             if len(s)])
    np.testing.assert_array_equal(starts, np.asarray(full.start))


def test_device_fastq_parse_matches_host(example_data):
    """Full device pipeline: raw FASTQ bytes -> kmer counts +
    composition, vs the host parser + host counting."""
    import gzip
    import bionumpy_tpu as bnp
    from bionumpy_tpu.ops.parse import parse_fastq_chunk_on_device
    raw = gzip.open(example_data / "big.fq.gz", "rb").read()
    counts, comp, n_entries = parse_fastq_chunk_on_device(
        np.frombuffer(raw, dtype=np.uint8), k=5)
    assert n_entries == 1000
    host = bnp.open(str(example_data / "big.fq.gz")).read()
    seqs = bnp.change_encoding(host.sequence, bnp.DNAEncoding)
    host_counts = bnp.count_kmers(seqs, 5)
    np.testing.assert_array_equal(counts, host_counts.counts)
    host_comp = bnp.count_encoded(seqs, axis=None)
    np.testing.assert_array_equal(comp, host_comp.counts)


def test_device_fastq_parse_rejects_malformed():
    from bionumpy_tpu.ops.parse import parse_fastq_chunk_on_device
    bad = b"@r1\nACGT\nX\nIIII\n"
    with pytest.raises(ValueError):
        parse_fastq_chunk_on_device(np.frombuffer(bad, dtype=np.uint8))


def test_sharded_sparse_count_k31(mesh8):
    """Flagship path: per-shard packed 31-mer tables, device all_gather +
    sorted merge (VERDICT r1 item 3)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bionumpy_tpu.parallel import (sharded_sparse_count_step,
                                       shard_packed_reads)
    from bionumpy_tpu.parallel.sparse_parallel import host_merge_check
    rng = np.random.default_rng(7)
    lengths = rng.integers(20, 80, 300)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    k, cap = 31, 1 << 11
    words, ends, n_true = shard_packed_reads(flat, lengths, 8)
    w = jax.device_put(jnp.asarray(words), NamedSharding(mesh8, P("dp", None)))
    e = jax.device_put(jnp.asarray(ends), NamedSharding(mesh8, P("dp", None)))
    nt = jax.device_put(jnp.asarray(n_true), NamedSharding(mesh8, P("dp")))
    step = sharded_sparse_count_step(mesh8, k, cap)
    m_lo, m_hi, counts, n_unique = [np.asarray(x) for x in step(w, e, nt)]
    nu = int(n_unique)
    got = (m_lo[:nu].astype(np.uint64)
           | (m_hi[:nu].astype(np.uint64) << np.uint64(32)))
    exp_h, exp_c = host_merge_check(flat, lengths, k)
    assert nu == len(exp_h)
    np.testing.assert_array_equal(got, exp_h)
    np.testing.assert_array_equal(counts[:nu], exp_c)


def test_sharded_sparse_count_duplicate_heavy(mesh8):
    """Shards sharing most kmers: the cross-shard merge must SUM counts."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bionumpy_tpu.parallel import (sharded_sparse_count_step,
                                       shard_packed_reads)
    from bionumpy_tpu.parallel.sparse_parallel import host_merge_check
    rng = np.random.default_rng(11)
    one_read = rng.integers(0, 4, 60).astype(np.uint8)
    flat = np.tile(one_read, 64)
    lengths = np.full(64, 60)
    k, cap = 21, 1 << 9
    words, ends, n_true = shard_packed_reads(flat, lengths, 8)
    w = jax.device_put(jnp.asarray(words), NamedSharding(mesh8, P("dp", None)))
    e = jax.device_put(jnp.asarray(ends), NamedSharding(mesh8, P("dp", None)))
    nt = jax.device_put(jnp.asarray(n_true), NamedSharding(mesh8, P("dp")))
    step = sharded_sparse_count_step(mesh8, k, cap)
    m_lo, m_hi, counts, n_unique = [np.asarray(x) for x in step(w, e, nt)]
    nu = int(n_unique)
    exp_h, exp_c = host_merge_check(flat, lengths, k)
    got = (m_lo[:nu].astype(np.uint64)
           | (m_hi[:nu].astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(got, exp_h)
    np.testing.assert_array_equal(counts[:nu], exp_c)
    assert counts[:nu].max() >= 64  # duplicates actually summed


def test_merge_hash_tables_host_equiv():
    import jax.numpy as jnp
    from bionumpy_tpu.parallel import merge_hash_tables
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50, 4096, dtype=np.uint64)
    cnts = rng.integers(1, 9, 4096).astype(np.int32)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    # sprinkle sentinels (unused cap slots)
    lo[::17] = 0xFFFFFFFF
    hi[::17] = 0xFFFFFFFF
    cnts[::17] = 0
    m_lo, m_hi, m_cnt, nu = [np.asarray(x) for x in merge_hash_tables(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(cnts), 4096)]
    nu = int(nu)
    mask = np.ones(len(vals), bool)
    mask[::17] = False
    exp_h, exp_idx = np.unique(vals[mask], return_inverse=True)
    exp_c = np.bincount(exp_idx, weights=cnts[mask]).astype(np.int64)
    assert nu == len(exp_h)
    got = (m_lo[:nu].astype(np.uint64)
           | (m_hi[:nu].astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(got, exp_h)
    np.testing.assert_array_equal(m_cnt[:nu], exp_c)


def test_sharded_histogram(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bionumpy_tpu.parallel import sharded_histogram_step
    rng = np.random.default_rng(13)
    values = rng.uniform(0, 50, (8, 500)).astype(np.float32)
    valid = rng.random((8, 500)) < 0.9
    edges = np.linspace(0.0, 50.0, 11).astype(np.float32)
    v = jax.device_put(jnp.asarray(values), NamedSharding(mesh8, P("dp", None)))
    m = jax.device_put(jnp.asarray(valid), NamedSharding(mesh8, P("dp", None)))
    step = sharded_histogram_step(mesh8, 10)
    got = np.asarray(step(v, m, jnp.asarray(edges)))
    exp, _ = np.histogram(values[valid], bins=edges)
    np.testing.assert_array_equal(got, exp)


def test_sharded_sum_and_n(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bionumpy_tpu.parallel import sharded_sum_and_n_step
    rng = np.random.default_rng(17)
    values = rng.normal(3.0, 1.0, (8, 256)).astype(np.float32)
    valid = rng.random((8, 256)) < 0.7
    v = jax.device_put(jnp.asarray(values), NamedSharding(mesh8, P("dp", None)))
    m = jax.device_put(jnp.asarray(valid), NamedSharding(mesh8, P("dp", None)))
    step = sharded_sum_and_n_step(mesh8)
    s, n = step(v, m)
    assert int(n) == int(valid.sum())
    np.testing.assert_allclose(float(s), float(values[valid].sum()),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s) / int(n), values[valid].mean(),
                               rtol=1e-5)


def test_sharded_pileup(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bionumpy_tpu.parallel import sharded_pileup_step
    rng = np.random.default_rng(19)
    n_pos = 1000
    starts = rng.integers(0, n_pos - 10, (8, 64)).astype(np.int32)
    stops = (starts + rng.integers(1, 10, (8, 64))).astype(np.int32)
    valid = rng.random((8, 64)) < 0.8
    s = jax.device_put(jnp.asarray(starts), NamedSharding(mesh8, P("dp", None)))
    e = jax.device_put(jnp.asarray(stops), NamedSharding(mesh8, P("dp", None)))
    m = jax.device_put(jnp.asarray(valid), NamedSharding(mesh8, P("dp", None)))
    step = sharded_pileup_step(mesh8, n_pos)
    got = np.asarray(step(s, e, m))
    exp = np.zeros(n_pos + 1, np.int32)
    for ss, ee in zip(starts[valid].ravel(), stops[valid].ravel()):
        exp[ss] += 1
        exp[ee] -= 1
    np.testing.assert_array_equal(got, np.cumsum(exp[:-1]))


def test_scaling_proxy(mesh8):
    """Fixed-work sweep runs and reports the compute/collective split
    (the scaling-efficiency proxy; real multi-chip is unreachable here)."""
    from bionumpy_tpu.parallel.scaling import measure
    records = measure(n_devices_list=(1, 4), n_bases=1 << 16,
                      cap=1 << 10, iters=1)
    assert [r["n_devices"] for r in records] == [1, 4]
    for r in records:
        assert r["t_with_collectives_s"] > 0
        assert "collective_overhead_s" in r and "efficiency_proxy" in r


def test_count_minimizers_fastq_mesh_exact(example_data):
    """Mesh-composed minimizer counting on real file bytes equals the
    in-memory single-device count (VERDICT r4: mesh-compose
    minimizers)."""
    import bionumpy_tpu as bnp
    from bionumpy_tpu.parallel import create_mesh
    from bionumpy_tpu.pipeline import count_minimizers_fastq
    from bionumpy_tpu.sequence import count_minimizers

    mesh = create_mesh(4)
    path = str(example_data / "big.fq.gz")
    counts, stats = count_minimizers_fastq(path, 21, 30, cap=1 << 15,
                                           target_bases=20_000,
                                           mesh=mesh)
    assert stats["n_reads"] == 1000
    reads = bnp.open(path).read()
    seqs = bnp.change_encoding(reads.sequence, bnp.DNAEncoding)
    expected = count_minimizers(seqs, 21, 30)
    np.testing.assert_array_equal(counts.label_codes,
                                  expected.label_codes)
    np.testing.assert_array_equal(counts.counts, expected.counts)
    assert stats["n_windows"] == int(expected.counts.sum())


def test_get_motif_matches_fastq_mesh_exact(example_data):
    """Mesh-composed PWM scan on real file bytes equals both the
    in-memory score scan and the pinned golden positions."""
    import json
    import os
    import bionumpy_tpu as bnp
    from bionumpy_tpu.io.jaspar import read_jaspar_matrix
    from bionumpy_tpu.parallel import create_mesh
    from bionumpy_tpu.pipeline import get_motif_matches_fastq

    mesh = create_mesh(4)
    path = str(example_data / "big.fq.gz")
    pwm = read_jaspar_matrix(str(example_data / "MA0080.1.jaspar"))
    threshold = 6.0
    rows, offs, stats = get_motif_matches_fastq(
        path, pwm, threshold, cap=1 << 15, target_bases=20_000,
        mesh=mesh)
    assert stats["n_reads"] == 1000
    assert stats["n_matches"] == len(rows)

    # framework single-device expectation over every read
    reads = bnp.open(path).read()
    seqs = bnp.change_encoding(reads.sequence, bnp.DNAEncoding)
    scores = bnp.get_motif_scores(seqs, pwm)
    exp = [(r, int(p)) for r in range(len(seqs))
           for p in np.flatnonzero(np.asarray(scores[r]) > threshold)]
    assert list(zip(rows.tolist(), offs.tolist())) == exp

    # and the pinned golden subset (first 100 reads)
    golden = json.load(open(os.path.join(
        os.path.dirname(__file__), "golden",
        "pwm_ma0080_matches.json")))
    got_first = [[int(r), int(o)] for r, o in zip(rows, offs)
                 if r < golden["n_reads"]]
    # golden threshold must match for the subset comparison to hold
    assert golden["threshold"] == threshold
    assert got_first == golden["matches"]


def test_binned_pileup_bed_mesh_exact(example_data):
    """Mesh-composed whole-genome binned pileup from a real BED file
    equals an independent per-chromosome numpy recompute."""
    from bionumpy_tpu.parallel import create_mesh
    from bionumpy_tpu.pipeline import binned_pileup_bed

    chroms = {"chr21": 46709983, "chr22": 50818468}
    bin_size = 1000
    mesh = create_mesh(4)
    path = str(example_data / "ctcf_chr21-22.bed.gz")
    tracks, stats = binned_pileup_bed(path, chroms, bin_size=bin_size,
                                      mesh=mesh)
    import bionumpy_tpu as bnp
    bed = bnp.open(path).read()
    total_check = 0
    for name, size in chroms.items():
        sel = np.asarray(bed.chromosome.tolist()) == name
        starts = np.asarray(bed.start)[sel]
        stops = np.asarray(bed.stop)[sel]
        diff = np.zeros(size + 1, np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, stops, -1)
        dense = np.cumsum(diff[:-1])
        pad = (-size) % bin_size
        want = np.concatenate([dense, np.zeros(pad, np.int64)]) \
            .reshape(-1, bin_size).sum(axis=-1)
        np.testing.assert_array_equal(tracks[name], want)
        total_check += int(want.sum())
    assert total_check == sum(
        int(x.sum()) for x in tracks.values())
    assert stats["n_intervals"] == len(bed)
