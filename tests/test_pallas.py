"""Pallas kernel parity vs the XLA path (runs in interpreter mode on the
CPU test mesh; the same kernel is validated compiled on real TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("k", [3, 16, 21, 31])
def test_pallas_kernel_matches_xla(k):
    from jax.experimental.pallas import tpu as pltpu

    from bionumpy_tpu.ops.kmers import kmer_hashes_masked, prepare_codes
    from bionumpy_tpu.ops.pallas_kmers import pallas_kmer_hashes

    rng = np.random.default_rng(0)
    lengths = rng.integers(0, 120, 300)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    codes, dist, n = prepare_codes(flat, lengths, min_bucket=1 << 14)
    lo1, hi1, v1 = kmer_hashes_masked(jnp.asarray(codes),
                                      jnp.asarray(dist), k)
    with pltpu.force_tpu_interpret_mode():
        lo2, hi2, v2 = pallas_kmer_hashes(jnp.asarray(codes),
                                          jnp.asarray(dist), k)
    np.testing.assert_array_equal(np.asarray(lo1), np.asarray(lo2))
    np.testing.assert_array_equal(np.asarray(hi1), np.asarray(hi2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.parametrize("k", [3, 16, 21, 31])
def test_pallas_fullsum_matches_xla(k):
    from jax.experimental.pallas import tpu as pltpu

    from bionumpy_tpu.ops.kmers import _kmer_fullsum_packed_xla, \
        prepare_packed
    from bionumpy_tpu.ops.pallas_kmers import pallas_fullsum_packed

    rng = np.random.default_rng(1)
    lengths = rng.integers(0, 120, 300)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    words, _, _ = prepare_packed(flat, lengths)
    a = _kmer_fullsum_packed_xla(jnp.asarray(words), k)
    with pltpu.force_tpu_interpret_mode():
        b = pallas_fullsum_packed(jnp.asarray(words), k)
    assert int(a[0]) == int(b[0]) and int(a[1]) == int(b[1])
