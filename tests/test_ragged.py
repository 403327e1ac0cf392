import numpy as np
import pytest

from bionumpy_tpu.ragged import (RaggedArray, RaggedShape, RaggedView,
                                 ragged_slice)


@pytest.fixture
def ra():
    return RaggedArray([[1, 2, 3], [4], [], [5, 6]])


def test_basic_properties(ra):
    assert len(ra) == 4
    assert ra.size == 6
    np.testing.assert_array_equal(ra.lengths, [3, 1, 0, 2])
    np.testing.assert_array_equal(ra.starts, [0, 3, 4, 4])
    np.testing.assert_array_equal(ra.ends, [3, 4, 4, 6])
    np.testing.assert_array_equal(ra.ravel(), [1, 2, 3, 4, 5, 6])


def test_row_indexing(ra):
    np.testing.assert_array_equal(ra[0], [1, 2, 3])
    np.testing.assert_array_equal(ra[2], [])
    np.testing.assert_array_equal(ra[-1], [5, 6])
    sub = ra[1:3]
    assert sub.tolist() == [[4], []]
    fancy = ra[np.array([3, 0])]
    assert fancy.tolist() == [[5, 6], [1, 2, 3]]
    boolean = ra[np.array([True, False, False, True])]
    assert boolean.tolist() == [[1, 2, 3], [5, 6]]


def test_element_indexing(ra):
    assert ra[0, 1] == 2
    assert ra[3, -1] == 6
    np.testing.assert_array_equal(ra[np.array([0, 3]), np.array([0, 1])], [1, 6])


def test_col_slice(ra):
    assert ra[:, 1:].tolist() == [[2, 3], [], [], [6]]
    assert ra[:, :-1].tolist() == [[1, 2], [], [], [5]]
    assert ra[:, :2].tolist() == [[1, 2], [4], [], [5, 6]]


def test_ufuncs(ra):
    assert (ra + 1).tolist() == [[2, 3, 4], [5], [], [6, 7]]
    assert (ra * ra).tolist() == [[1, 4, 9], [16], [], [25, 36]]
    assert (ra == 4).tolist() == [[False, False, False], [True], [], [False, False]]
    col = np.array([[10], [20], [30], [40]])
    assert (ra + col).tolist() == [[11, 12, 13], [24], [], [45, 46]]


def test_reductions(ra):
    assert ra.sum() == 21
    np.testing.assert_array_equal(ra.sum(axis=-1), [6, 4, 0, 11])
    np.testing.assert_array_equal(ra.any(axis=-1), [True, True, False, True])
    np.testing.assert_array_equal((ra > 2).sum(axis=-1), [1, 1, 0, 2])
    ra2 = RaggedArray([[1, 5, 3], [2, 2]])
    np.testing.assert_array_equal(ra2.max(axis=-1), [5, 2])
    np.testing.assert_array_equal(ra2.min(axis=-1), [1, 2])
    np.testing.assert_array_equal(ra2.argmax(axis=-1), [1, 0])
    np.testing.assert_array_equal(ra2.mean(axis=-1), [3, 2])


def test_padded_export(ra):
    padded = ra.as_padded_matrix(fill_value=-1)
    np.testing.assert_array_equal(
        padded, [[1, 2, 3], [4, -1, -1], [-1, -1, -1], [5, 6, -1]])
    left = ra.as_padded_matrix(side="left", fill_value=0)
    np.testing.assert_array_equal(
        left, [[1, 2, 3], [0, 0, 4], [0, 0, 0], [0, 5, 6]])


def test_ragged_view():
    data = np.arange(20)
    view = RaggedView(np.array([2, 10, 5]), np.array([3, 0, 2]))
    out = RaggedArray(data, view)
    assert out.tolist() == [[2, 3, 4], [], [5, 6]]


def test_ragged_slice(ra):
    out = ragged_slice(ra, starts=np.array([1, 0, 0, 0]),
                       ends=np.array([3, 1, 0, 1]))
    assert out.tolist() == [[2, 3], [4], [], [5]]


def test_concatenate(ra):
    out = np.concatenate([ra, RaggedArray([[7], [8, 9]])])
    assert out.tolist() == [[1, 2, 3], [4], [], [5, 6], [7], [8, 9]]


def test_array_function_reductions(ra):
    np.testing.assert_array_equal(np.sum(ra, axis=-1), [6, 4, 0, 11])
    assert np.sum(ra) == 21
    w = np.where(ra > 2, ra, 0)
    assert w.tolist() == [[0, 0, 3], [4], [], [5, 6]]


def test_setitem(ra):
    ra[1] = 100
    assert ra.tolist() == [[1, 2, 3], [100], [], [5, 6]]
    ra[np.array([0])] = np.array([9, 9, 9])
    assert ra[0].tolist() == [9, 9, 9]


def test_zero_rows():
    ra = RaggedArray([])
    assert len(ra) == 0
    assert ra.sum(axis=-1).tolist() == []
    assert (ra + 1).tolist() == []


def test_cumsum_rows():
    ra = RaggedArray([[1, 2, 3], [4, 5], []])
    out = ra.cumsum(axis=-1)
    assert out.tolist() == [[1, 3, 6], [4, 9], []]


class TestPackedKmerKernels:
    """The packed-transport kernels: full-sum + row-end correction ==
    masked sums; count via subtraction == masked scatter counts."""

    def _random_case(self, seed):
        rng = np.random.default_rng(seed)
        n_rows = int(rng.integers(1, 40))
        lengths = rng.integers(1, 60, n_rows)
        flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
        return flat, lengths

    def test_checksum_packed_matches_pipeline(self):
        import jax.numpy as jnp
        from bionumpy_tpu.ops.kmers import (
            kmer_checksum_packed, kmer_checksum_pipeline_packed,
            prepare_packed)
        for seed in range(5):
            flat, lengths = self._random_case(seed)
            for k in (2, 16, 17, 31):
                words, ends, n = prepare_packed(flat, lengths)
                a = kmer_checksum_packed(jnp.asarray(words),
                                         jnp.asarray(ends), k)
                b = kmer_checksum_pipeline_packed(
                    jnp.asarray(words), jnp.asarray(ends), k, n)
                assert tuple(int(x) for x in a) == \
                    tuple(int(x) for x in b)

    def test_count_small_packed_matches_masked(self):
        import jax.numpy as jnp
        from bionumpy_tpu.ops.kmers import (
            kmer_count_small, kmer_count_small_packed, prepare_codes,
            prepare_packed)
        for seed in range(5):
            flat, lengths = self._random_case(seed + 10)
            for k in (1, 3, 7):
                words, ends, n = prepare_packed(flat, lengths)
                got = np.asarray(kmer_count_small_packed(
                    jnp.asarray(words), jnp.asarray(ends), k, 4 ** k, n))
                codes, dist, _ = prepare_codes(flat, lengths)
                want = np.asarray(kmer_count_small(
                    jnp.asarray(codes), jnp.asarray(dist), k, 4 ** k))
                np.testing.assert_array_equal(got, want)

    def test_native_correction_matches_numpy(self):
        from bionumpy_tpu.native import (_kmer_correction_sums_py,
                                         kmer_correction_sums)
        from bionumpy_tpu.ops.kmers import prepare_packed
        for seed in range(5):
            flat, lengths = self._random_case(seed + 20)
            words, ends, _ = prepare_packed(flat, lengths)
            ends = ends.astype(np.int64)
            starts = np.insert(ends[:-1], 0, 0)
            for k in (2, 16, 31, 32):
                a = kmer_correction_sums(words, ends, starts, k)
                b = _kmer_correction_sums_py(words.view(np.uint8), ends,
                                             starts, k)
                assert a == b

    def test_streamed_hybrid_checksum(self):
        import jax.numpy as jnp
        from bionumpy_tpu.ops.kmers import (kmer_checksum_packed,
                                            kmer_checksum_streamed,
                                            prepare_packed)
        flat, lengths = self._random_case(33)
        for k in (5, 31):
            got = kmer_checksum_streamed(flat, lengths, k, n_chunks=3)
            words, ends, _ = prepare_packed(flat, lengths)
            want = kmer_checksum_packed(jnp.asarray(words),
                                        jnp.asarray(ends), k)
            assert got == tuple(int(x) for x in want)
