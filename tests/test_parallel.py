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
