"""Property-based round-trip tests for vectorized string ops
(reference: tests/property_tests/test_strops.py:1-96)."""
import numpy as np
import pytest
from hypothesis import example, given, settings
import hypothesis.strategies as st
from numpy.testing import assert_array_almost_equal, assert_array_equal

from bionumpy_tpu import as_encoded_array
from bionumpy_tpu.io.strops import (float_to_strings, int_lists_to_strings,
                                    ints_to_strings, join, split, str_equal,
                                    str_to_float, str_to_int)
from bionumpy_tpu.ragged import RaggedArray
from bionumpy_tpu.util.testing import (assert_encoded_array_equal,
                                       assert_encoded_raggedarray_equal)

from .strategies import ascii_text, floats, integers


@pytest.mark.parametrize("sep", [",", "\t"])
@given(strings=st.lists(ascii_text(), min_size=0))
def test_join(sep, strings):
    joined = join(as_encoded_array(strings), sep=sep)
    true = as_encoded_array(sep.join(strings))
    assert_encoded_array_equal(joined, true)


@given(sequence=ascii_text())
def test_split(sequence):
    seq = as_encoded_array(sequence)
    parts = split(seq, sep=",")
    assert_encoded_raggedarray_equal(parts, as_encoded_array(sequence.split(",")))


@given(ints=st.lists(integers(), min_size=1))
@example(ints=[-9223372036854775807])
def test_ints_to_strings(ints):
    strings = ints_to_strings(ints)
    assert_encoded_raggedarray_equal(
        strings, as_encoded_array([str(i) for i in ints]))


@given(ints=st.lists(integers(), min_size=1))
def test_str_to_int(ints):
    int_strings = [str(i) for i in ints]
    result = str_to_int(as_encoded_array(int_strings))
    assert_array_equal(result, ints)


@given(_floats=st.lists(floats().filter(lambda x: abs(x) > 10 ** (-15)),
                        min_size=1))
@example(_floats=[1.80143985e+15])
@example(_floats=[1.3230423433805828e+16])
def test_str_to_float(_floats):
    _floats = np.array(_floats)
    float_strings = [str(f) for f in _floats]
    parsed = str_to_float(as_encoded_array(float_strings))
    true = np.array([float(s) for s in float_strings])
    tf, tm = np.frexp(true)
    f, m = np.frexp(parsed)
    assert_array_almost_equal(f, tf)
    assert_array_equal(m, tm)


@given(sequences=st.lists(ascii_text(), min_size=1), match_string=ascii_text())
def test_str_equal(sequences, match_string):
    true = [s == match_string for s in sequences]
    result = str_equal(as_encoded_array(sequences), match_string)
    assert_array_equal(true, result)


@given(int_lists=st.lists(st.lists(integers(), min_size=1), min_size=1))
def test_int_lists_to_strings(int_lists):
    ra = RaggedArray(int_lists)
    strings = int_lists_to_strings(ra, sep=",")
    true = as_encoded_array([",".join(str(i) for i in ints) for ints in int_lists])
    assert_encoded_raggedarray_equal(strings, true)


@given(_floats=st.lists(floats().filter(lambda x: abs(x) > 10 ** (-15)),
                        min_size=1))
@settings(max_examples=100)
def test_float_to_strings_roundtrip(_floats):
    # Looser than exact text parity (the reference skips its exact variant,
    # reference: tests/property_tests/test_strops.py:82-96): rendered text
    # must re-parse to the same float within rounding.
    _floats = np.array(_floats)
    ra = float_to_strings(_floats)
    result = np.array([float(row.to_string()) for row in ra])
    assert_array_almost_equal(result / np.maximum(np.abs(_floats), 1e-300),
                              np.sign(_floats) * np.ones_like(_floats), decimal=5)
