"""Lazy record batches: parse fields from a retained FileBuffer only when
accessed (reference: bionumpy/bnpdataclass/lazybnpdataclass.py:19-225).

Lazy parsing matters on TPU for the same reason it does on CPU: a filtered
pass over a file only pays for the fields it touches, and the write path can
pass unmodified raw text straight through.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from numbers import Number
from typing import Any, Optional, Type

import numpy as np

from .bnpdataclass import BNPDataClass


class LazyBNPDataClass:
    pass


class ItemGetter:
    """Bridges a FileBuffer to lazy field access by field index."""

    def __init__(self, buffer, dataclass, start_line: int = 0):
        self._buffer = buffer
        self._dataclass = dataclass
        self._field_dict = {
            field.name: (i, field.type)
            for i, field in enumerate(dataclasses.fields(dataclass))}
        self._buffer.validate_if_not()
        self._start_line = start_line

    def concatenate(self, itemgetters):
        return self.__class__(
            self._buffer.concatenate([ig._buffer for ig in itemgetters]),
            itemgetters[0]._dataclass, itemgetters[0]._start_line)

    @lru_cache()
    def n_entries(self):
        return self._buffer.count_entries()

    def __call__(self, name):
        from ..io.exceptions import FormatException
        index, field_type = self._field_dict[name]
        try:
            return self._buffer.get_field_by_number(index, field_type)
        except FormatException as e:
            e.line_number += self._start_line
            raise e

    def __getitem__(self, idx):
        return self.__class__(self._buffer[idx], self._dataclass)

    @property
    def buffer(self):
        return self._buffer


def create_lazy_class(dataclass: Type[BNPDataClass],
                      header: Optional[Any] = None) -> Type[BNPDataClass]:
    field_names = [field.name for field in dataclasses.fields(dataclass)]

    class NewClass(dataclass, LazyBNPDataClass):
        def __init__(self, item_getter, set_values=None, computed_values=None):
            self._itemgetter = item_getter
            self._set_values = set_values or {}
            self._computed_values = computed_values or {}
            self._computed = False
            self._data = None
            self._header = header

        def __len__(self):
            return self._itemgetter.n_entries()

        def __getattr__(self, var_name):
            if var_name.startswith("_"):
                raise AttributeError(var_name)
            if var_name in self._set_values:
                return self._set_values[var_name]
            if var_name in field_names:
                if var_name not in self._computed_values:
                    self._computed_values[var_name] = self._get_field(var_name)
                return self._computed_values[var_name]
            raise AttributeError(var_name)

        def _get_field(self, var_name):
            from ..io.exceptions import FormatException, ParsingException
            try:
                return self._itemgetter(var_name)
            except FormatException:
                raise
            except Exception as e:
                raise ParsingException(
                    f"Error when parsing field {var_name} from "
                    f"{self.__class__.__name__}") from e

        def __setattr__(self, key, value):
            if key in ("_itemgetter", "_set_values", "_computed", "_data",
                       "_computed_values", "_header"):
                return object.__setattr__(self, key, value)
            self._set_values[key] = value
            if key in self._computed_values:
                del self._computed_values[key]

        def __getitem__(self, idx):
            if isinstance(idx, Number):
                return self[[idx]].get_data_object()[0]
            new_set = {k: v[idx] for k, v in self._set_values.items()}
            new_computed = {k: v[idx] for k, v in self._computed_values.items()}
            return self.__class__(self._itemgetter[idx], new_set, new_computed)

        def __replace__(self, **kwargs):
            new_set = dict(self._set_values)
            new_set.update(kwargs)
            return self.__class__(self._itemgetter, new_set)

        def __iter__(self):
            return iter(self.get_data_object())

        def __repr__(self):
            return self[:10].get_data_object().__repr__().replace(
                "with 10 entries", f"with {len(self)} entries")

        __str__ = __repr__

        def get_data_object(self) -> BNPDataClass:
            if not self._computed:
                fields = [getattr(self, name) for name in field_names]
                self._data = dataclass(*fields)
                self._computed = True
            return self._data

        def toiter(self): return self.get_data_object().toiter()
        def tolist(self): return self.get_data_object().tolist()
        def todict(self): return self.get_data_object().todict()
        def topandas(self): return self.get_data_object().topandas()

        @classmethod
        def empty(cls):
            return dataclass.empty()

        def __array_function__(self, func, types, args, kwargs):
            if not all(issubclass(t, LazyBNPDataClass) for t in types):
                return NotImplemented
            if func is np.concatenate:
                values = list(args[0])
                if hasattr(values[0]._itemgetter.buffer, "concatenate"):
                    set_values = {
                        name: np.concatenate([a._set_values[name]
                                              for a in values])
                        for name in self._set_values}
                    computed = {
                        name: np.concatenate([a._computed_values[name]
                                              for a in values])
                        for name in self._computed_values
                        if all(name in a._computed_values for a in values)}
                    return self.__class__(
                        self._itemgetter.concatenate(
                            [a._itemgetter for a in values]),
                        set_values=set_values, computed_values=computed)
                objects = [a.get_data_object() for a in values]
                return func(objects, *args[1:], **kwargs)
            return NotImplemented

        def get_buffer(self, buffer_class=None):
            from ..io.dump_csv import get_column
            buffer = self._itemgetter.buffer
            if buffer_class is None:
                buffer_class = buffer.__class__
            if not hasattr(buffer, "get_field_range_as_text") or \
                    getattr(buffer, "SKIP_LAZY", False) or \
                    getattr(buffer_class, "SKIP_LAZY", False):
                return buffer.from_data(self.get_data_object())
            if not self._set_values and isinstance(buffer, buffer_class):
                return buffer.data.ravel()
            if not buffer_class.supports_modified_write:
                raise ValueError(
                    f"{buffer_class} does not support writing modified data")
            columns = []
            for i, field in enumerate(dataclasses.fields(dataclass)):
                if field.name in self._set_values:
                    columns.append(get_column(
                        buffer_class.process_field_for_write(
                            field.name, self._set_values[field.name]),
                        field.type))
                else:
                    columns.append(buffer.get_field_range_as_text(i, i + 1))
            return buffer_class.join_fields(columns)

        def get_context(self, name):
            if name == "header":
                return self._header

        def has_context(self, name):
            return name == "header"

    NewClass.__name__ = dataclass.__name__
    NewClass.__qualname__ = dataclass.__qualname__
    return NewClass
