"""Property-based encode/decode round-trips for every alphabet encoding
(reference: tests/property_tests/test_encodings.py:1-25)."""
import hypothesis.strategies as st
from hypothesis import given

import bionumpy_tpu.encodings.alphabet_encoding as ae
from bionumpy_tpu import as_encoded_array
from bionumpy_tpu.encoded_array import EncodedArray
from bionumpy_tpu.encodings import BaseEncoding
from bionumpy_tpu.util.testing import assert_encoded_array_equal

objs = (getattr(ae, name) for name in dir(ae) if not name.startswith("_"))
encodings = [obj for obj in objs if isinstance(obj, ae.AlphabetEncoding)]


@st.composite
def encoding_and_unencoded_data(draw):
    from .strategies import get_strategy_from_encoding
    encoding = draw(st.sampled_from(encodings))
    return encoding, draw(get_strategy_from_encoding(encoding)())


@given(encoding_and_unencoded_data())
def test_encode_decode(data):
    encoding, unencoded = data
    upper_unencoded = unencoded.upper()
    unencoded = as_encoded_array(unencoded)
    encoded = encoding.encode(unencoded)
    decoded = EncodedArray(encoding.decode(encoded), BaseEncoding)
    assert_encoded_array_equal(decoded, as_encoded_array(upper_unencoded))
