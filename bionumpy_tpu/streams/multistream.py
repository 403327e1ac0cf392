"""Chromosome-synchronized multi-source streams (reference:
bionumpy/streams/multistream.py:36-218)."""
from __future__ import annotations

import logging
from typing import Union

from ..bnpdataclass import BNPDataClass
from .groupby_func import groupby
from .stream import BnpStream, NpDataclassStream

logger = logging.getLogger(__name__)


class StreamError(Exception):
    pass


class SequenceSizes(dict):
    pass


def human_key_func(chrom_name: str):
    assert chrom_name.startswith("chr"), chrom_name
    parts = chrom_name[3:].split("_", maxsplit=1)
    is_numeric = 1 - parts[0].isdigit()
    b = parts[0] if is_numeric else int(parts[0])
    c = parts[-1] if len(parts) == 2 else ""
    return (is_numeric, b, c)


def sort_dict_by_key(dictionary, key=None):
    return {k: dictionary[k] for k in sorted(dictionary.keys(), key=key)}


class SynchedStream(BnpStream):
    """Group a stream by chromosome and emit groups in `contig_order`,
    filling missing contigs with an empty default."""

    def __init__(self, stream, contig_order):
        self._stream = stream
        self._contig_order = list(contig_order)
        self._grouping_attribute = "chromosome"
        self._has_default = True
        self._default_value = stream.dataclass.empty() \
            if getattr(stream, "dataclass", None) is not None else None
        self._key_func = lambda x: x

    def set_grouping_attribute(self, attribute_name):
        self._grouping_attribute = attribute_name

    def set_key_function(self, key_function):
        self._key_func = key_function

    def set_default(self, default_value):
        self._has_default = True
        self._default_value = default_value

    def __iter__(self):
        grouped = groupby(self._stream, self._grouping_attribute)
        cur_idx = 0
        seen = set()
        for name, data in grouped:
            name = self._key_func(name)
            if name in seen:
                raise StreamError(
                    f"Sort-order discrepancy: {name} occurred twice")
            if name not in self._contig_order:
                raise StreamError(
                    f"Stream had value not in contig order: {name} "
                    f"({self._contig_order})")
            while cur_idx < len(self._contig_order) and \
                    name != self._contig_order[cur_idx]:
                if not self._has_default:
                    raise StreamError(
                        f"Missing data for {self._contig_order[cur_idx]} and "
                        f"no default set")
                logger.info("Filling empty data for missing contig %s",
                            self._contig_order[cur_idx])
                yield self._default_value
                seen.add(self._contig_order[cur_idx])
                cur_idx += 1
            if cur_idx >= len(self._contig_order):
                raise StreamError(
                    f"Stream element {name} after end of contig order")
            yield data
            seen.add(name)
            cur_idx += 1
        while cur_idx < len(self._contig_order):
            if not self._has_default:
                raise StreamError(
                    f"Missing data for {self._contig_order[cur_idx]} and no "
                    f"default set")
            yield self._default_value
            cur_idx += 1

    def __repr__(self):
        return f"SynchedStream over {self._contig_order}"

    __str__ = __repr__


class IndexedStream(BnpStream):
    """Stream over dict-like values in contig order."""

    def __init__(self, lookup, contig_order):
        self._lookup = lookup
        self._contig_order = list(contig_order)

    def __iter__(self):
        return (self._lookup[name] for name in self._contig_order)

    def __repr__(self):
        return f"IndexedStream over contigs: {self._contig_order}"

    __str__ = __repr__


class MultiStream:
    """Synchronize several streams/dicts on a common chromosome order."""

    def __init__(self, sequence_sizes, **kwargs):
        from ..datatypes import ChromosomeSize
        if isinstance(sequence_sizes, dict):
            sequence_names = list(sequence_sizes.keys())
            sequence_lengths = list(sequence_sizes.values())
        elif isinstance(sequence_sizes, ChromosomeSize):
            sequence_names = sequence_sizes.name.tolist()
            sequence_lengths = np.asarray(sequence_sizes.size).tolist()
        else:
            raise TypeError(
                "MultiStream needs a dict or ChromosomeSize, got "
                f"{type(sequence_sizes)}")
        self._sequence_names = sequence_names
        self.lengths = BnpStream(sequence_lengths)
        self.sequence_names = BnpStream(sequence_names)
        for keyword, value in kwargs.items():
            if isinstance(value, BNPDataClass):
                value = NpDataclassStream([value], value.__class__)
            if isinstance(value, BnpStream):
                self.__dict__[keyword] = SynchedStream(value, sequence_names)
            elif hasattr(value, "__getitem__"):
                self.__dict__[keyword] = IndexedStream(value, sequence_names)
            else:
                raise ValueError(
                    f"Only streams and dict-likes supported: {keyword}")

    def set_defaults(self, **kwargs):
        for keyword, default_value in kwargs.items():
            assert keyword in self.__dict__
            self.__dict__[keyword].set_default(default_value)

    def set_key_functions(self, **kwargs):
        for keyword, key_function in kwargs.items():
            assert keyword in self.__dict__
            self.__dict__[keyword].set_key_function(key_function)

    human_key_func = staticmethod(human_key_func)
    sort_dict_by_key = staticmethod(sort_dict_by_key)


import numpy as np  # noqa: E402
