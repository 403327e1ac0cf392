"""__array_function__ / __array_ufunc__ parity with the reference's
whitelist (reference: bionumpy/encoded_array.py:454-486 — bincount,
argsort, concatenate, where, zeros_like, append, lexsort, full_like,
insert, sliding_window_view, as_strided) plus the ragged-level functions
downstream bionumpy code relies on."""
import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.encoded_array import EncodedArray, EncodedRaggedArray
from bionumpy_tpu.ragged import RaggedArray


@pytest.fixture
def enc():
    return bnp.as_encoded_array("ACGTTGCA", bnp.DNAEncoding)


@pytest.fixture
def ragged():
    return bnp.as_encoded_array(["ACGT", "GG", "TTTAA"], bnp.DNAEncoding)


def test_bincount(enc):
    got = np.bincount(enc, minlength=4)
    np.testing.assert_array_equal(got, [2, 2, 2, 2])


def test_argsort(enc):
    got = np.argsort(enc)
    np.testing.assert_array_equal(np.asarray(enc.raw())[got],
                                  np.sort(np.asarray(enc.raw())))


def test_concatenate(enc):
    out = np.concatenate([enc, enc])
    assert isinstance(out, EncodedArray)
    assert out.to_string() == "ACGTTGCAACGTTGCA"


def test_where(enc):
    other = bnp.as_encoded_array("GGGGGGGG", bnp.DNAEncoding)
    mask = np.asarray(enc.raw()) == 0
    out = np.where(mask, enc, other)
    assert out.to_string() == "AGGGGGGA"


def test_zeros_like_full_like(enc):
    z = np.zeros_like(enc)
    assert isinstance(z, EncodedArray) and z.to_string() == "A" * 8
    f = np.full_like(enc, "C")
    assert f.to_string() == "C" * 8


def test_append_insert(enc):
    tail = bnp.as_encoded_array("GG", bnp.DNAEncoding)
    out = np.append(enc, tail)
    assert out.to_string() == "ACGTTGCAGG"
    ins = np.insert(enc, 1, tail)
    assert ins.to_string() == "AGGCGTTGCA"


def test_lexsort(enc):
    second = bnp.as_encoded_array("AACCGGTT", bnp.DNAEncoding)
    order = np.lexsort((enc, second))
    exp = np.lexsort((np.asarray(enc.raw()), np.asarray(second.raw())))
    np.testing.assert_array_equal(order, exp)


def test_sliding_window_view(enc):
    win = np.lib.stride_tricks.sliding_window_view(enc, 3)
    assert isinstance(win, EncodedArray)
    assert win.raw().shape == (6, 3)
    np.testing.assert_array_equal(
        np.asarray(win.raw()),
        np.lib.stride_tricks.sliding_window_view(
            np.asarray(enc.raw()), 3))


def test_unique_repeat(enc):
    vals, counts = np.unique(enc, return_counts=True)
    assert counts.sum() == 8
    rep = np.repeat(enc, 2)
    assert rep.to_string() == "AACCGGTTTTGGCCAA"


def test_equality_ufunc_with_strings(ragged):
    eq = ragged == "G"
    assert isinstance(eq, RaggedArray)
    np.testing.assert_array_equal(np.asarray(eq.ravel()),
                                  [0, 0, 1, 0, 1, 1, 0, 0, 0, 0, 0])
    row_eq = ragged == ["ACGT", "GG", "AAAAA"]
    np.testing.assert_array_equal(
        np.asarray(row_eq.any(axis=-1)) if hasattr(row_eq, "any")
        else row_eq, [True, True, True])


def test_ragged_reductions(ragged):
    mask = ragged == "T"
    assert int(np.sum(mask)) == 4
    per_row = np.sum(mask, axis=-1)
    np.testing.assert_array_equal(per_row, [1, 0, 3])
    assert np.all(np.concatenate([ragged, ragged]).lengths
                  == [4, 2, 5, 4, 2, 5])


def test_ragged_where_zeros_like(ragged):
    z = np.zeros_like(ragged == "A", dtype=int)
    assert isinstance(z, RaggedArray)
    np.testing.assert_array_equal(z.lengths, ragged.lengths)


def test_as_strided_on_raw(enc):
    # np.lib.stride_tricks.as_strided does not go through
    # __array_function__ dispatch for non-ndarray inputs (numpy builds a
    # raw memory interface and segfaults); the supported spelling — as in
    # the reference's own usage sites — is on .raw()
    raw = np.asarray(enc.raw())
    out = np.lib.stride_tricks.as_strided(
        raw, shape=(3, 2), strides=(raw.strides[0],) * 2)
    assert out.shape == (3, 2)


def test_as_strided_method(enc):
    raw = np.asarray(enc.raw())
    out = enc.as_strided(shape=(3, 2), strides=(raw.strides[0],) * 2)
    assert isinstance(out, EncodedArray)
    assert out.raw().shape == (3, 2)
