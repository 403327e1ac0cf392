"""Halo exchange for one long sharded sequence (parallel/halo.py) and
device track kernels (ops/tracks.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import bionumpy_tpu as bnp


@pytest.fixture(scope="module")
def mesh8():
    from bionumpy_tpu.parallel import create_mesh
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(8)


@pytest.fixture(scope="module")
def genome_codes():
    rng = np.random.default_rng(101)
    return rng.integers(0, 4, 100_003).astype(np.uint8)


def _host_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    vals = np.zeros(len(codes), dtype=np.uint64)
    c = codes.astype(np.uint64)
    for j in range(k):
        vals[: len(codes) - j] |= c[j:] << np.uint64(2 * j)
    return vals


def test_sharded_kmer_hash_equals_single(mesh8, genome_codes):
    """Windows crossing shard edges must hash over the neighbour's bases
    (the ppermute halo), bit-identical to the unsharded computation."""
    from bionumpy_tpu.parallel.halo import (shard_long_sequence,
                                            sharded_kmer_hash_step)
    k = 31
    blocks, n = shard_long_sequence(genome_codes, 8)
    b = jax.device_put(jnp.asarray(blocks),
                       NamedSharding(mesh8, P("dp", None)))
    lo, hi, valid = [np.asarray(x) for x in
                     sharded_kmer_hash_step(mesh8, k)(b, jnp.int64(n))]
    lo, hi, valid = lo.reshape(-1), hi.reshape(-1), valid.reshape(-1)
    expected = _host_hashes(genome_codes, k)
    exp_valid = np.zeros(blocks.size, bool)
    exp_valid[: max(n - k + 1, 0)] = True
    np.testing.assert_array_equal(valid, exp_valid)
    got = lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got[:n][exp_valid[:n]],
                                  expected[exp_valid[:n]])


def test_sharded_minimizers_equal_single(mesh8, genome_codes):
    from bionumpy_tpu.ops.minimizers import minimizer_limbs
    from bionumpy_tpu.ops.device import distance_to_row_end
    from bionumpy_tpu.parallel.halo import (shard_long_sequence,
                                            sharded_minimizer_step)
    k, w = 21, 30
    blocks, n = shard_long_sequence(genome_codes, 8)
    b = jax.device_put(jnp.asarray(blocks),
                       NamedSharding(mesh8, P("dp", None)))
    lo, hi, valid = [np.asarray(x).reshape(-1) for x in
                     sharded_minimizer_step(mesh8, k, w)(b, jnp.int64(n))]
    # single-device twin on the whole sequence
    pad = (-len(genome_codes)) % 16
    codes = np.concatenate([genome_codes,
                            np.zeros(pad + 32, np.uint8)])
    dist = np.zeros(len(codes) - 32, np.int32)
    dist[:n] = distance_to_row_end(np.array([n]))
    s_lo, s_hi, s_valid = [np.asarray(x) for x in minimizer_limbs(
        jnp.asarray(codes), jnp.asarray(dist), k, w - k + 1)]
    nv = n - w + 1
    assert valid[:nv].all() and not valid[nv:].any()
    np.testing.assert_array_equal(lo[:nv], s_lo[:nv])
    np.testing.assert_array_equal(hi[:nv], s_hi[:nv])


def test_dense_pileup_matches_host():
    from bionumpy_tpu.ops.tracks import dense_pileup
    rng = np.random.default_rng(3)
    n = 5000
    starts = rng.integers(0, n - 50, 400).astype(np.int32)
    stops = (starts + rng.integers(1, 50, 400)).astype(np.int32)
    valid = rng.random(400) < 0.85
    got = np.asarray(dense_pileup(jnp.asarray(starts), jnp.asarray(stops),
                                  jnp.asarray(valid), n))
    exp = np.zeros(n + 1, np.int32)
    np.add.at(exp, starts[valid], 1)
    np.add.at(exp, stops[valid], -1)
    np.testing.assert_array_equal(got, np.cumsum(exp[:-1]))


@pytest.mark.parametrize("bin_size", [10, 64, 1000])
def test_binned_pileup_matches_dense(bin_size):
    from bionumpy_tpu.ops.tracks import binned_pileup
    rng = np.random.default_rng(7)
    n_bins = 37
    n = n_bins * bin_size
    starts = rng.integers(0, n - 1, 500).astype(np.int32)
    stops = np.minimum(starts + rng.integers(1, 3 * bin_size, 500),
                       n).astype(np.int32)
    valid = rng.random(500) < 0.9
    got = np.asarray(binned_pileup(jnp.asarray(starts),
                                   jnp.asarray(stops),
                                   jnp.asarray(valid), n_bins, bin_size))
    depth = np.zeros(n + 1, np.int64)
    np.add.at(depth, starts[valid], 1)
    np.add.at(depth, stops[valid], -1)
    depth = np.cumsum(depth[:-1])
    exp = depth.reshape(n_bins, bin_size).sum(axis=-1)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("bin_size", [16, 1000, 999])
def test_gc_track_matches_reduceat(genome_codes, bin_size):
    from bionumpy_tpu.ops.tracks import gc_track
    seq = bnp.EncodedArray(genome_codes, bnp.DNAEncoding)
    got = gc_track(bnp.EncodedRaggedArray(seq, [len(genome_codes)]),
                   bin_size)
    gc = (genome_codes == 1) | (genome_codes == 2)
    exp = np.add.reduceat(gc, np.arange(0, len(gc), bin_size))
    np.testing.assert_array_equal(got, exp)


def test_count_minimizers_matches_materialized(genome_codes):
    from bionumpy_tpu.sequence import count_minimizers
    rng = np.random.default_rng(61)
    lengths = rng.integers(25, 120, 300)
    flat = genome_codes[: int(lengths.sum())]
    seqs = bnp.EncodedRaggedArray(
        bnp.EncodedArray(flat, bnp.DNAEncoding), lengths)
    k, w = 21, 30
    table = count_minimizers(seqs, k, w)
    mins = bnp.get_minimizers(seqs, k, w)
    exp_h, exp_c = np.unique(
        np.asarray(mins.ravel().raw()).astype(np.uint64),
        return_counts=True)
    np.testing.assert_array_equal(table.label_codes, exp_h)
    np.testing.assert_array_equal(table.counts, exp_c)
    # tiny cap exercises the retry loop
    table2 = count_minimizers(seqs, k, w, cap=8)
    np.testing.assert_array_equal(table2.counts, exp_c)


def test_halo_guard_rejects_tiny_shards():
    """Shards shorter than the halo are rejected instead of hashing
    over missing data (ADVICE r2)."""
    import pytest
    from bionumpy_tpu.parallel.halo import (shard_long_sequence,
                                            sharded_minimizer_step)
    codes = np.zeros(64, np.uint8)  # 8 bases/shard on 8 shards
    with pytest.raises(ValueError, match="halo"):
        shard_long_sequence(codes, 8, window_size=31)
