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
