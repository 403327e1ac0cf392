"""Chunk streams (reference: bionumpy/streams/stream.py:1-53).

A one-look-ahead iterator wrapper over record-batch chunks; attribute
access on a dataclass stream yields a stream of field arrays.
"""
from __future__ import annotations


class BnpStream:
    def __init__(self, stream):
        self._stream = iter(stream)
        self._next_buffer = next(self._stream, None)
        self._opened = False

    @property
    def is_opened(self) -> bool:
        return self._opened

    def __iter__(self):
        return self

    def __next__(self):
        self._opened = True
        if self._next_buffer is None:
            raise StopIteration
        result = self._next_buffer
        self._next_buffer = next(self._stream, None)
        return result

    def __str__(self):
        status = "opened" if self._opened else "unopened"
        return (f"{status.capitalize()} stream of data buffers. Next buffer:\n"
                f"{self._next_buffer}")

    def __repr__(self):
        return f"{self.__class__.__name__}({self._next_buffer!r}, ...)"


class ChunkStream(BnpStream):
    pass


class ArrayStream(ChunkStream):
    pass


class NpDataclassStream(BnpStream):
    """Stream of record batches; attribute access maps to a per-chunk field
    stream."""

    def __init__(self, stream, dataclass=None):
        super().__init__(stream)
        self.dataclass = dataclass

    def __getattr__(self, attribute_name):
        if attribute_name.startswith("_"):
            raise AttributeError(attribute_name)
        return ArrayStream(getattr(chunk, attribute_name) for chunk in self)


def grouped_dict(attribute_name=None):
    def decorator(base_class):
        base_class.grouped_dict_attribute = attribute_name
        return base_class
    return decorator


class grouped_stream(BnpStream):
    """Stream of (group_key, data) pairs (reference:
    bionumpy/streams/grouped.py:14-18)."""

    def __init__(self, stream, attribute_name=None):
        self.attribute_name = attribute_name
        super().__init__(stream)
