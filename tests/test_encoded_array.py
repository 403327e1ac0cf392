import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu import (BaseEncoding, DNAEncoding, EncodedArray,
                          EncodedRaggedArray, as_encoded_array,
                          change_encoding, from_encoded_array)
from bionumpy_tpu.encodings import EncodingError, QualityEncoding
from bionumpy_tpu.encodings.alphabet_encoding import ACGTnEncoding


def test_encode_string():
    ea = as_encoded_array("ACGT", DNAEncoding)
    np.testing.assert_array_equal(ea.raw(), [0, 1, 2, 3])
    assert ea.to_string() == "ACGT"
    assert str(ea) == "ACGT"


def test_base_encoding_roundtrip():
    ea = as_encoded_array("hello!")
    assert ea.encoding is BaseEncoding or ea.encoding == BaseEncoding
    np.testing.assert_array_equal(ea.raw(), np.frombuffer(b"hello!", np.uint8))
    assert ea.to_string() == "hello!"


def test_encode_list():
    era = as_encoded_array(["ACGT", "GG", ""], DNAEncoding)
    assert isinstance(era, EncodedRaggedArray)
    assert era.tolist() == ["ACGT", "GG", ""]
    np.testing.assert_array_equal(era.lengths, [4, 2, 0])
    np.testing.assert_array_equal(era.ravel().raw(), [0, 1, 2, 3, 2, 2])


def test_case_insensitive():
    ea = as_encoded_array("acgt", DNAEncoding)
    np.testing.assert_array_equal(ea.raw(), [0, 1, 2, 3])


def test_invalid_char_raises():
    with pytest.raises(EncodingError) as err:
        as_encoded_array("ACXT", DNAEncoding)
    assert err.value.offset == 2


def test_equality_with_string():
    era = as_encoded_array(["ACGT", "GG"], DNAEncoding)
    eq = era == "G"
    assert eq.tolist() == [[False, False, True, False], [True, True]]
    flat = as_encoded_array("ACGG", DNAEncoding)
    np.testing.assert_array_equal(flat == "G", [False, False, True, True])


def test_quality_encoding_numeric():
    q = as_encoded_array(["!!II"], QualityEncoding)
    # numeric encodings return raw ragged arrays
    assert q.tolist() == [[0, 0, 40, 40]]


def test_change_encoding():
    base = as_encoded_array("ACGT")
    dna = as_encoded_array(base, DNAEncoding)
    np.testing.assert_array_equal(dna.raw(), [0, 1, 2, 3])
    back = change_encoding(dna, BaseEncoding)
    assert back.to_string() == "ACGT"


def test_alphabet_prefix_compat():
    dna = as_encoded_array("ACG", DNAEncoding)
    reinterpreted = as_encoded_array(dna, ACGTnEncoding)
    np.testing.assert_array_equal(reinterpreted.raw(), dna.raw())
    assert reinterpreted.encoding == ACGTnEncoding


def test_from_encoded_array():
    era = as_encoded_array(["AC", "GT"], DNAEncoding)
    assert from_encoded_array(era) == ["AC", "GT"]
    assert from_encoded_array(era[0]) == "AC"


def test_indexing_preserves_encoding():
    era = as_encoded_array(["ACGT", "GG", "TT"], DNAEncoding)
    row = era[0]
    assert isinstance(row, EncodedArray)
    assert row.encoding == DNAEncoding
    sub = era[1:]
    assert isinstance(sub, EncodedRaggedArray)
    assert sub.tolist() == ["GG", "TT"]
    sliced = era[:, 1:]
    assert sliced.tolist() == ["CGT", "G", "T"]


def test_concat_encoded():
    a = as_encoded_array("AC", DNAEncoding)
    b = as_encoded_array("GT", DNAEncoding)
    joined = np.concatenate([a, b])
    assert joined.to_string() == "ACGT"


def test_kmer_encoding_roundtrip():
    enc = bnp.KmerEncoding(DNAEncoding, 3)
    h = enc.encode("ACG")
    # little-endian polynomial: A=0, C=1, G=2 -> 0 + 1*4 + 2*16 = 36
    assert int(h.raw()) == 36
    assert enc.to_string(36) == "ACG"
    labels = bnp.KmerEncoding(DNAEncoding, 2).get_labels()
    assert labels[0] == "AA" and labels[1] == "CA" and len(labels) == 16


def test_string_encoding():
    enc = bnp.StringEncoding(["chr1", "chr2", "chr10"])
    vals = enc.encode(as_encoded_array(["chr2", "chr1", "chr10", "chr2"]))
    np.testing.assert_array_equal(vals.raw(), [1, 0, 2, 1])
    assert enc.to_string(2) == "chr10"
    with pytest.raises(EncodingError):
        enc.encode(as_encoded_array(["chrX"]))


def test_string_array():
    sa = bnp.string_array(["alpha", "b", "ccc"])
    assert sa.tolist() == ["alpha", "b", "ccc"]
    np.testing.assert_array_equal(sa.lengths, [5, 1, 3])
    np.testing.assert_array_equal(sa == "b", [False, True, False])
    np.testing.assert_array_equal(np.isin(sa, ["b", "ccc"]),
                                  [False, True, True])
    joined = np.concatenate([sa, bnp.string_array(["d"])])
    assert joined.tolist() == ["alpha", "b", "ccc", "d"]


def test_encoded_lookup():
    lut = bnp.EncodedLookup(np.arange(4) * 10, DNAEncoding)
    assert lut["G"] == 20
    np.testing.assert_array_equal(lut[as_encoded_array("AT", DNAEncoding)],
                                  [0, 30])


def test_repr_smoke():
    era = as_encoded_array(["ACGT", "GG"], DNAEncoding)
    assert "ACGT" in repr(era)
    ea = as_encoded_array("ACGT", DNAEncoding)
    assert "ACGT" in repr(ea)
