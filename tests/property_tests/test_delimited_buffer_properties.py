"""Property-based tsv round-trip through generated buffer classes
(reference: tests/property_tests/test_delimited_buffers.py:1-64)."""
import dataclasses
from functools import partial
from typing import List

import hypothesis.strategies as st
from hypothesis import given, settings

from bionumpy_tpu.bnpdataclass import bnpdataclass
from bionumpy_tpu.io.delimited_buffers import get_bufferclass_for_datatype
from bionumpy_tpu.util.testing import assert_bnpdataclass_equal

from .strategies import ascii_text, floats, integers

type_to_strategy = {
    int: integers,
    str: partial(ascii_text, min_size=1),
    float: lambda: floats().filter(lambda x: abs(x) > 10 ** (-15)),
    List[int]: partial(st.lists, elements=integers(), min_size=1),
    List[bool]: partial(st.lists, elements=st.booleans(), min_size=1),
}


@bnpdataclass
class MyDataclass:
    name: str
    age: int
    money: float
    child_ages: List[int]
    child_gender: List[bool]


def table_strategies(dataclass):
    fixed_dict = {field.name: type_to_strategy[field.type]()
                  for field in dataclasses.fields(dataclass)}
    return st.lists(st.fixed_dictionaries(fixed_dict), min_size=1)


def table_to_dataclass(dataclass, table):
    return dataclass(*[[row[field.name] for row in table]
                       for field in dataclasses.fields(dataclass)])


@given(tables=table_strategies(MyDataclass))
@settings(max_examples=50, deadline=None)
def test_to_from_data(tables):
    data = table_to_dataclass(MyDataclass, tables)
    buffer_class = get_bufferclass_for_datatype(MyDataclass)
    buf = buffer_class.from_data(data)
    file_buffer = buffer_class.from_raw_buffer(buf)
    new_data = file_buffer.get_data()
    assert_bnpdataclass_equal(new_data, data)
