import numpy as np
import pytest

from bionumpy_tpu.arithmetics import (forbes, get_boolean_mask, get_pileup,
                                      intersect, jaccard, merge_intervals,
                                      sort_intervals, unique_intersect)
from bionumpy_tpu.datatypes import Interval


@pytest.fixture
def intervals():
    return Interval(["chr1", "chr1", "chr1"], [3, 5, 10], [8, 7, 12])


def test_pileup_golden(intervals):
    pileup = get_pileup(intervals, 20)
    np.testing.assert_array_equal(
        pileup.to_array(),
        [0, 0, 0, 1, 1, 2, 2, 1, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0])


def test_boolean_mask_golden(intervals):
    mask = get_boolean_mask(intervals, 20)
    np.testing.assert_array_equal(
        mask.to_array().astype(int),
        [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0])
    complement = ~mask
    assert complement.to_array()[0] and not complement.to_array()[3]
    other = get_boolean_mask(Interval(["chr1"], [9], [15]), 20)
    np.testing.assert_array_equal(
        (mask & other).to_array().astype(int),
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(other[np.asarray(intervals.start)],
                                  [False, False, True])


def test_merge_intervals(intervals):
    merged = merge_intervals(intervals)
    np.testing.assert_array_equal(merged.start, [3, 10])
    np.testing.assert_array_equal(merged.stop, [8, 12])


def test_merge_with_distance(intervals):
    merged = merge_intervals(intervals, distance=3)
    np.testing.assert_array_equal(merged.start, [3])
    np.testing.assert_array_equal(merged.stop, [12])


def test_intersect():
    a = Interval(["chr1"] * 2, [5, 15], [10, 25])
    b = Interval(["chr1"] * 2, [8, 20], [18, 22])
    result = intersect(a, b)
    np.testing.assert_array_equal(result.start, [8, 15, 20])
    np.testing.assert_array_equal(result.stop, [10, 18, 22])


def test_unique_intersect():
    a = Interval(["chr1"] * 3, [0, 10, 30], [5, 20, 35])
    b = Interval(["chr1"], [12], [14])
    result = unique_intersect(a, b, 50)
    np.testing.assert_array_equal(result.start, [10])


def test_sort_intervals():
    a = Interval.from_entry_tuples(
        [("chr2", 5, 10), ("chr1", 8, 12), ("chr1", 2, 4)])
    out = sort_intervals(a, sort_order=["chr1", "chr2"])
    assert out.chromosome.tolist() == ["chr1", "chr1", "chr2"]
    np.testing.assert_array_equal(out.start, [2, 8, 5])


def test_forbes_golden():
    a = Interval.from_entry_tuples([("chr1", 10, 20), ("chr2", 20, 30)])
    b = Interval.from_entry_tuples([("chr2", 15, 25), ("chr1", 10, 40)])
    a_sorted = sort_intervals(a, sort_order=["chr1", "chr2"])
    b_sorted = sort_intervals(b, sort_order=["chr1", "chr2"])
    assert forbes({"chr1": 100, "chr2": 200}, a_sorted, b_sorted) == 5.625


def test_jaccard():
    a = Interval.from_entry_tuples([("chr1", 0, 10)])
    b = Interval.from_entry_tuples([("chr1", 5, 15)])
    value = jaccard({"chr1": 100}, a, b)
    assert value == pytest.approx(5 / 15)


def test_pileup_vs_bedtools_style(example_data):
    import bionumpy_tpu.io as bio
    intervals = bio.bnp_open(str(example_data / "small_interval.bed")).read()
    size = int(np.asarray(intervals.stop).max())
    pile = get_pileup(intervals, size)
    dense = np.zeros(size, dtype=int)
    for start, stop in zip(np.asarray(intervals.start),
                           np.asarray(intervals.stop)):
        dense[start:stop] += 1
    np.testing.assert_array_equal(pile.to_array(), dense)
