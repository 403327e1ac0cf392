import numpy as np
import pytest
from hypothesis import given, strategies as st

from bionumpy_tpu.encoded_array import as_encoded_array
from bionumpy_tpu.io.strops import (float_to_strings, int_lists_to_strings,
                                    ints_to_strings, join, split, str_equal,
                                    str_to_float, str_to_float_with_missing,
                                    str_to_int, str_to_int_with_missing)
from bionumpy_tpu.ragged import RaggedArray


def test_str_to_int():
    text = as_encoded_array(["123", "-42", "0", "+7", "1000000"])
    np.testing.assert_array_equal(str_to_int(text), [123, -42, 0, 7, 1000000])


def test_str_to_int_flat():
    assert str_to_int(as_encoded_array("1234")) == 1234


def test_str_to_float():
    text = as_encoded_array(["3.14", "-2.5", "100", "1e3", "-1.5e-2", "2.5E2"])
    np.testing.assert_allclose(
        str_to_float(text), [3.14, -2.5, 100.0, 1000.0, -0.015, 250.0])


def test_str_to_float_nan():
    out = str_to_float(as_encoded_array(["nan", "1.5"]))
    assert np.isnan(out[0]) and out[1] == 1.5


def test_missing_values():
    np.testing.assert_array_equal(
        str_to_int_with_missing(as_encoded_array([".", "5", "."])), [0, 5, 0])
    out = str_to_float_with_missing(as_encoded_array([".", "2.0"]))
    assert np.isnan(out[0]) and out[1] == 2.0


def test_ints_to_strings():
    out = ints_to_strings(np.array([0, 5, -17, 100, 999, 1000]))
    assert out.tolist() == ["0", "5", "-17", "100", "999", "1000"]


def test_float_to_strings():
    out = float_to_strings(np.array([1.5, -2.25]))
    assert out.tolist() == ["1.5", "-2.25"]


def test_int_lists_to_strings():
    ra = RaggedArray([[1, 22, 3], [4], []])
    out = int_lists_to_strings(ra)
    assert out.tolist() == ["1,22,3", "4", ""]
    out2 = int_lists_to_strings(ra, keep_last=True)
    assert out2.tolist() == ["1,22,3,", "4,", ""]


def test_join_split_roundtrip():
    rows = as_encoded_array(["ab", "c", "", "def"])
    joined = join(rows, sep="\t")
    assert joined.to_string() == "ab\tc\t\tdef"
    back = split(joined, sep="\t")
    assert back.tolist() == ["ab", "c", "", "def"]


def test_split_multi_sep():
    seq = as_encoded_array("a=1;b=2")
    parts = split(seq, sep=[";", "="])
    assert parts.tolist() == ["a", "1", "b", "2"]


def test_str_equal():
    rows = as_encoded_array(["chr1", "chr2", "chr1", "x"])
    np.testing.assert_array_equal(str_equal(rows, "chr1"),
                                  [True, False, True, False])
    np.testing.assert_array_equal(
        str_equal(rows, as_encoded_array(["chr1", "chr2", "chr2", "y"])),
        [True, True, False, False])
    assert str_equal(as_encoded_array("abc"), "abc")
    assert not str_equal(as_encoded_array("abc"), "abd")
    assert not str_equal(as_encoded_array("abc"), "ab")


@given(st.lists(st.integers(min_value=-10**12, max_value=10**12), min_size=1,
                max_size=20))
def test_int_roundtrip_property(numbers):
    text = ints_to_strings(np.array(numbers))
    np.testing.assert_array_equal(str_to_int(text), numbers)


@given(st.lists(st.floats(min_value=-1e12, max_value=1e12,
                          allow_nan=False, allow_infinity=False,
                          allow_subnormal=False),
                min_size=1, max_size=10))
def test_float_roundtrip_property(numbers):
    text = float_to_strings(np.array(numbers))
    np.testing.assert_allclose(str_to_float(text), numbers, rtol=1e-12)
