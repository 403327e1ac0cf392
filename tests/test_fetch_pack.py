"""Delta-compressed table fetch (ops/fetch_pack): exact round trip
through the 8 B/row packed transport, including exception handling
(big deltas, big counts) and the overflow fallback."""
import numpy as np
import pytest

import jax.numpy as jnp

from bionumpy_tpu.ops.fetch_pack import (EXC_CAP, HEAD, pack_sorted_table,
                                         unpack_sorted_table)


def roundtrip(hashes, cnt, cap):
    n = len(hashes)
    acc = np.full((3, cap), 0xFFFFFFFF, np.uint32)
    acc[0, :n] = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    acc[1, :n] = (hashes >> np.uint64(32)).astype(np.uint32)
    acc[2, :n] = cnt
    acc[2, n:] = 0
    slab = np.asarray(pack_sorted_table(jnp.asarray(acc), jnp.int32(n)))
    n_exc = int(slab[:, :HEAD].reshape(4, EXC_CAP + 1)[0, 0])
    # prefix-slice fetch semantics: only HEAD + n (+slack) columns used
    return unpack_sorted_table(slab[:, : HEAD + n + 5]), n_exc


@pytest.mark.parametrize("n", [1, 5, 1000, 200_000])
def test_roundtrip_uniform(n):
    rng = np.random.default_rng(n)
    hashes = np.unique(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    cnt = rng.integers(1, 1000, len(hashes), dtype=np.uint32)
    cnt[rng.random(len(cnt)) < 1e-3] = 1 << 20  # rare count exceptions
    out, _ = roundtrip(hashes, cnt, max(1 << 10, len(hashes)))
    assert np.array_equal(out[0], hashes)
    assert np.array_equal(out[1], cnt.astype(np.int64))


def test_dense_table_has_no_exceptions():
    rng = np.random.default_rng(7)
    hashes = np.unique(rng.integers(0, 1 << 62, 1 << 20, dtype=np.uint64))
    cnt = rng.integers(1, 600, len(hashes), dtype=np.uint32)
    out, n_exc = roundtrip(hashes, cnt, 1 << 21)
    assert n_exc == 0
    assert np.array_equal(out[0], hashes)
    assert np.array_equal(out[1], cnt.astype(np.int64))


def test_clustered_hashes_use_delta_exceptions():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 20, 500, dtype=np.uint64)
    b = rng.integers((1 << 62) - (1 << 20), 1 << 62, 500, dtype=np.uint64)
    hashes = np.unique(np.concatenate([a, b]))
    cnt = np.ones(len(hashes), np.uint32)
    out, n_exc = roundtrip(hashes, cnt, 1 << 11)
    assert n_exc >= 1  # the 2^62-wide gap cannot fit 48 bits
    assert np.array_equal(out[0], hashes)
    assert np.array_equal(out[1], cnt.astype(np.int64))


def test_empty_table():
    out, _ = roundtrip(np.empty(0, np.uint64), np.empty(0, np.uint32),
                       1 << 10)
    assert len(out[0]) == 0 and len(out[1]) == 0


def test_exception_overflow_returns_none():
    rng = np.random.default_rng(5)
    hashes = np.unique(rng.integers(0, 1 << 62, EXC_CAP + 1000,
                                    dtype=np.uint64))
    cnt = np.full(len(hashes), 1 << 17, np.uint32)  # every row excepts
    out, n_exc = roundtrip(hashes, cnt, 1 << 13)
    assert out is None and n_exc > EXC_CAP


def test_pack32_adversarial_exceptions():
    """32-bit rows: heavy-tail deltas and counts >= 256 go through the
    2^16-row exception block exactly (the minimizer-table regime)."""
    from bionumpy_tpu.ops.fetch_pack import (HEAD32, pack_sorted_table32,
                                             unpack_sorted_table32)
    rng = np.random.default_rng(7)
    n = 5000
    h = np.sort(rng.choice(np.uint64(1) << np.uint64(42), n,
                           replace=False).astype(np.uint64))
    c = rng.integers(1, 5000, n).astype(np.uint32)  # many >= 256
    acc = np.zeros((3, n + 77), np.uint32)
    acc[0, :n] = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    acc[1, :n] = (h >> np.uint64(32)).astype(np.uint32)
    acc[2, :n] = c
    slab = np.asarray(pack_sorted_table32(jnp.asarray(acc),
                                          jnp.int32(n)))
    got_h, got_c = unpack_sorted_table32(slab[: HEAD32 + n + 13])
    assert np.array_equal(got_h, h)
    assert np.array_equal(got_c, c.astype(np.int64))


def test_pack32_zero_and_no_exceptions():
    from bionumpy_tpu.ops.fetch_pack import (HEAD32, pack_sorted_table32,
                                             unpack_sorted_table32)
    h = np.arange(1, 100, dtype=np.uint64) * 1000
    c = np.full(99, 3, np.uint32)
    acc = np.zeros((3, 128), np.uint32)
    acc[0, :99] = h.astype(np.uint32)
    acc[2, :99] = c
    slab = np.asarray(pack_sorted_table32(jnp.asarray(acc),
                                          jnp.int32(99)))
    got_h, got_c = unpack_sorted_table32(slab[: HEAD32 + 99])
    assert np.array_equal(got_h, h)
    assert np.array_equal(got_c, c.astype(np.int64))
    e_h, e_c = unpack_sorted_table32(np.asarray(
        pack_sorted_table32(jnp.asarray(acc), jnp.int32(0)))[:HEAD32])
    assert len(e_h) == 0 and len(e_c) == 0
