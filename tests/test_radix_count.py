"""Radix-partition counting prototype == the sort-path results."""
import numpy as np
import pytest

import jax.numpy as jnp

from bionumpy_tpu.ops.radix_count import radix_sorted_runs


@pytest.mark.parametrize("k", [31, 15])
@pytest.mark.parametrize("seed", [0, 1])
def test_radix_matches_numpy_unique(k, seed):
    rng = np.random.default_rng(seed)
    n = 1 << 14
    hash_bits = 2 * k
    hashes = rng.integers(0, 1 << min(hash_bits, 63), n,
                          dtype=np.uint64)
    # force duplicates
    hashes[::3] = hashes[0]
    valid = rng.random(n) < 0.9
    lo = (hashes & 0xFFFFFFFF).astype(np.uint32)
    hi = (hashes >> np.uint64(32)).astype(np.uint32)
    cap = n
    u_lo, u_hi, counts, n_u, n_v, over = radix_sorted_runs(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(valid),
        k, n_buckets=64, bucket_cap=8192, cap=cap)
    assert not bool(over)
    nu = int(n_u)
    got = (np.asarray(u_lo)[:nu].astype(np.uint64) |
           (np.asarray(u_hi)[:nu].astype(np.uint64) << np.uint64(32)))
    exp_h, exp_c = np.unique(hashes[valid], return_counts=True)
    assert int(n_v) == int(valid.sum())
    assert nu == len(exp_h)
    np.testing.assert_array_equal(got, exp_h)
    np.testing.assert_array_equal(np.asarray(counts)[:nu], exp_c)


def test_radix_overflow_flag():
    n = 4096
    lo = np.zeros(n, np.uint32)
    hi = np.zeros(n, np.uint32)  # everything in bucket 0
    valid = np.ones(n, bool)
    *_ , over = radix_sorted_runs(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(valid),
        31, n_buckets=64, bucket_cap=256, cap=n)
    assert bool(over)
