"""Assertion helpers for tests (reference: bionumpy/util/testing.py)."""
from __future__ import annotations

import dataclasses

import numpy as np
from numpy.testing import assert_array_almost_equal, assert_array_equal

from ..encoded_array import (EncodedArray, EncodedRaggedArray,
                             as_encoded_array)
from ..encodings.string_encodings import StringEncoding
from ..ragged import RaggedArray
from ..string_array import StringArray


def assert_raggedarray_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    assert_array_equal(np.asarray(a.lengths), np.asarray(b.lengths))
    ar = a.ravel()
    br = b.ravel()
    ar = ar.raw() if hasattr(ar, "raw") else ar
    br = br.raw() if hasattr(br, "raw") else br
    assert_array_equal(np.asarray(ar), np.asarray(br))


def assert_encoded_array_equal(array1, array2):
    array1, array2 = (as_encoded_array(a) for a in (array1, array2))
    assert np.all(np.asarray(array1 == array2)), (array1, array2)


def assert_raggedshape_equal(shape1, shape2):
    assert shape1[0] == shape2[0], (shape1, shape2)
    assert_array_equal(np.asarray(shape1[1]), np.asarray(shape2[1]))


def assert_string_array_equal(array1, array2):
    array1, array2 = (a.tolist() if isinstance(a, StringArray) else a
                      for a in (array1, array2))
    assert array1 == array2, (array1, array2)


def assert_encoded_raggedarray_equal(array1, array2):
    array1, array2 = (as_encoded_array(a) for a in (array1, array2))
    assert isinstance(array1, EncodedRaggedArray), array1
    assert isinstance(array2, EncodedRaggedArray), array2
    assert_raggedshape_equal(array1.shape, array2.shape)
    eq = array1 == array2
    assert np.all(np.asarray(eq.ravel())), (array1, array2)


def assert_float_close_enough(a, b):
    if np.allclose(a, b, equal_nan=True):
        return
    fa, ma = np.frexp(a)
    fb, mb = np.frexp(b)
    fa = np.where(ma > mb, fa * 2.0 ** np.maximum(ma - mb, 0), fa)
    fb = np.where(mb > ma, fb * 2.0 ** np.maximum(mb - ma, 0), fb)
    assert_array_almost_equal(fa, fb)


def assert_bnpdataclass_equal(a, b):
    assert [f.name for f in dataclasses.fields(a)] == \
        [f.name for f in dataclasses.fields(b)]
    for field in dataclasses.fields(a):
        s = getattr(a, field.name)
        o = getattr(b, field.name)
        if isinstance(s, EncodedArray) and \
                isinstance(s.encoding, StringEncoding):
            s = s.encoding.decode(s)
        if isinstance(o, EncodedArray) and \
                isinstance(o.encoding, StringEncoding):
            o = o.encoding.decode(o)
        if isinstance(s, StringArray) or isinstance(o, StringArray):
            assert_string_array_equal(s, o)
        elif isinstance(s, EncodedRaggedArray):
            assert_encoded_raggedarray_equal(s, o)
        elif isinstance(s, EncodedArray):
            assert_encoded_array_equal(s, o)
        elif isinstance(s, RaggedArray):
            assert_raggedarray_equal(s, o)
        elif isinstance(s, np.ndarray):
            if field.type == float:
                assert_float_close_enough(s, o)
            else:
                assert_array_equal(s, np.asarray(o))
        elif hasattr(s, "from_entry_tuples"):
            assert_bnpdataclass_equal(s, o)
        else:
            assert np.all(np.equal(s, o)), (field.name, s, o)
