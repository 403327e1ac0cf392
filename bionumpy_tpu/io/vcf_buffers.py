"""VCF buffers: lazy INFO parsing, genotype matrices (reference:
bionumpy/io/vcf_buffers.py:78-317)."""
from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

import numpy as np

from ..bnpdataclass import BNPDataClass, make_dataclass, narrow_type, replace
from ..bnpdataclass.lazybnpdataclass import (ItemGetter, LazyBNPDataClass,
                                             create_lazy_class)
from ..datatypes import (PhasedVCFGenotypeEntry, PhasedVCFHaplotypeEntry,
                         VCFEntry, VCFEntryWithGenotypes, VCFGenotypeEntry,
                         VCFWithInfoAsStringEntry)
from ..encoded_array import EncodedArray, as_encoded_array
from ..encodings.vcf_encoding import (GenotypeRowEncoding,
                                      PhasedGenotypeRowEncoding,
                                      PhasedHaplotypeRowEncoding)
from ..ragged import RaggedArray
from ..string_array import StringArray
from .delimited_buffers import DelimitedBuffer
from .dump_csv import dump_csv
from .named_text_buffer import NamedBufferExtractor
from .vcf_header import parse_header

logger = logging.getLogger(__name__)


class InfoBuffer(DelimitedBuffer):
    """Buffer over the INFO column's KEY=value tokens."""

    def __init__(self, buffer_extractor: NamedBufferExtractor,
                 dataclass: BNPDataClass):
        self._buffer_extractor = buffer_extractor
        self._dataclass = dataclass
        self._is_validated = True

    @property
    def dataclass(self):
        return self._dataclass

    @classmethod
    def concatenate(cls, buffers):
        extractor = buffers[0]._buffer_extractor.concatenate(
            [b._buffer_extractor for b in buffers])
        return cls(extractor, buffers[0]._dataclass)

    def __getitem__(self, idx):
        return self.__class__(self._buffer_extractor[idx], self._dataclass)

    def _get_field_by_number(self, col_number, field_type):
        if field_type == bool:
            return self._buffer_extractor.has_field_number(col_number)
        return super()._get_field_by_number(col_number, field_type)

    def _validate(self):
        pass


def translate_field_type(info_dict):
    t = info_dict.get("Type", str)
    number = info_dict.get("Number", 1)
    is_list = (number is None) or (number is not None and number > 1)
    if t == Optional[int] and is_list:
        return List[int]
    if t == Optional[float] and is_list:
        return List[float]
    if is_list:
        return str
    return t


def create_info_dataclass(header_data):
    if not header_data:
        return str
    header = parse_header(header_data)
    info_fields = [(key, translate_field_type(val))
                   for key, val in header.INFO.items()
                   if key != "Without ID"]
    return make_dataclass(info_fields, "InfoDataclass")


class VCFBuffer(DelimitedBuffer):
    """VCF: position is 1-based on disk, 0-based in memory
    (reference: bionumpy/io/vcf_buffers.py:100-103)."""

    dataclass = VCFEntry
    _info_dataclass = None
    _vcf_data_class = None
    info_cache = {}
    vcfentry_cache = {}

    @property
    def actual_dataclass(self):
        return self.vcf_data_class

    def _get_field_by_number(self, field_nr: int, field_type: type = object):
        if field_nr == 7:
            return self._get_info_field()
        if field_nr == 8:
            return self._extract_genotypes()
        if field_nr == 9:
            return self._extract_genotype_data()
        val = super()._get_field_by_number(field_nr, field_type)
        if field_nr == 1:
            val = val - 1
        return val

    @classmethod
    def from_data(cls, data: BNPDataClass) -> EncodedArray:
        if isinstance(data, LazyBNPDataClass):
            data = data.get_data_object()
        data = replace(data, position=np.asarray(data.position) + 1)
        return super().from_data(data)

    @classmethod
    def process_field_for_write(cls, field_name, value):
        if field_name == "position":
            return value + 1
        return super().process_field_for_write(field_name, value)

    @property
    def info_dataclass(self):
        if self._info_dataclass is None:
            self._info_dataclass = self._make_info_dataclass()
        return self._info_dataclass

    @property
    def vcf_data_class(self):
        if self._vcf_data_class is None:
            self._vcf_data_class = self._make_vcf_dataclass()
        return self._vcf_data_class

    def _make_info_dataclass(self):
        cache = self.__class__.info_cache
        if self.header_data in cache:
            return cache[self.header_data][0]
        dc = create_info_dataclass(self._header_data)
        cache[self.header_data] = (dc, create_lazy_class(dc)
                                   if dc is not str else None)
        return cache[self.header_data][0]

    def _make_vcf_dataclass(self):
        cache = self.__class__.vcfentry_cache
        key = (self.dataclass, self.header_data)
        if key in cache:
            return cache[key][0]
        info_class = str if not self.header_data or \
            "##INFO" not in self.header_data else self.info_dataclass
        vcf_entry = narrow_type(self.dataclass, "info", info_class)
        cache[key] = (vcf_entry, create_lazy_class(vcf_entry))
        return cache[key][0]

    @property
    def _lazy_info_class(self):
        return self.__class__.info_cache[self.header_data][1]

    @classmethod
    def modify_class_with_header_data(cls, header_data):
        if not header_data or "##INFO" not in header_data:
            return cls
        info_class = create_info_dataclass(header_data)
        new_dataclass = narrow_type(cls.dataclass, "info", info_class)
        new_lazy_class = create_lazy_class(new_dataclass)

        class ModifiedClass(cls):
            _header_data = header_data
            dataclass = new_dataclass
            lazy_class = new_lazy_class

        ModifiedClass.__name__ = cls.__name__ + "H"
        ModifiedClass.__qualname__ = cls.__qualname__ + "H"
        return ModifiedClass

    def _get_info_field(self):
        field_nr = 7
        if (not self._header_data) or ("##INFO" not in self._header_data):
            logger.warning(
                "No ##INFO in header; returning INFO field as text")
            return self._buffer_extractor.get_field_by_number(field_nr)
        return self._get_dataclass_field(field_nr, self.info_dataclass,
                                         self._lazy_info_class)

    def _get_dataclass_field(self, field_nr, dataclass, lazy_dataclass):
        text = self._buffer_extractor.get_field_by_number(field_nr,
                                                          keep_sep=True)
        flat_text = text.ravel()
        delimiters = np.flatnonzero(np.asarray(flat_text == ";")) + 1
        offsets = np.insert(np.cumsum(text.lengths), 0, 0)
        all_delimiters = np.sort(np.concatenate([delimiters, offsets]),
                                 kind="mergesort")
        delimiter_offsets = np.searchsorted(all_delimiters, offsets)
        dl_lens = np.diff(delimiter_offsets)
        starts = RaggedArray(all_delimiters[:-1].copy(), dl_lens)
        ends = RaggedArray(all_delimiters[1:], dl_lens) - 1
        lens = ends - starts
        extractor = NamedBufferExtractor(
            flat_text, starts, lens,
            [f.name for f in dataclasses.fields(dataclass)])
        buf = InfoBuffer(extractor, dataclass)
        item_getter = ItemGetter(buf, dataclass)
        return lazy_dataclass(item_getter)

    def _extract_genotypes(self):
        if self._buffer_extractor.n_fields < 10:
            return StringArray(
                np.empty((len(self._buffer_extractor), 0), dtype="S1"))
        byte_array = self._buffer_extractor.get_padded_field(
            slice(9, None), stop_at=":").raw()
        n_bytes = byte_array.shape[-1]
        if n_bytes == 0:
            out = np.empty(
                (len(self._buffer_extractor),
                 self._buffer_extractor.n_fields - 9), dtype="S1")
        else:
            out = np.ascontiguousarray(byte_array).view(
                f"S{n_bytes}").reshape(byte_array.shape[:-1])
        return StringArray(out)

    def _extract_genotype_data(self):
        return None

    def get_column_range_as_text(self, col_start, col_end, keep_sep=False):
        if col_start != 8:
            return super().get_column_range_as_text(col_start, col_end,
                                                    keep_sep=keep_sep)
        return self._buffer_extractor.get_fields_by_range(from_nr=8,
                                                          to_nr=None,
                                                          keep_sep=keep_sep)

    @classmethod
    def make_header(cls, data) -> bytes:
        header = ""
        if data.has_context("header") and data.get_context("header"):
            header = data.get_context("header")
        else:
            header = "\n".join([
                "##fileformat=VCFv4.1",
                "\t".join("#CHROM POS ID REF ALT QUAL FILTER INFO "
                          "FORMAT".split())]) + "\n"
        return bytes(header, "ascii")


class VCFBuffer2(VCFBuffer):
    dataclass = VCFEntryWithGenotypes

    @classmethod
    def from_data(cls, data: BNPDataClass) -> EncodedArray:
        if isinstance(data, LazyBNPDataClass):
            return cls.from_data(data.get_data_object())
        data = replace(data, position=np.asarray(data.position) + 1)
        data_dict = [(field.type, getattr(data, field.name))
                     for field in dataclasses.fields(data)]
        data_dict = data_dict[:-1] + \
            [(str, as_encoded_array(["GT"] * len(data)))] + [data_dict[-1]]
        return dump_csv(data_dict, cls.DELIMITER)


class VCFWithInfoAsStringBuffer(VCFBuffer):
    dataclass = VCFWithInfoAsStringEntry


class VCFMatrixBuffer(VCFBuffer):
    dataclass = VCFGenotypeEntry
    genotype_encoding = GenotypeRowEncoding

    def _get_field_by_number(self, field_nr: int, field_type: type = object):
        if field_nr != 8:
            assert field_nr < 8, (field_nr, field_type)
            return super()._get_field_by_number(field_nr, field_type)
        genotype_data = self._buffer_extractor.get_fixed_length_field(
            slice(9, None), 3)
        return EncodedArray(self.genotype_encoding.encode(genotype_data),
                            self.genotype_encoding)


class PhasedVCFMatrixBuffer(VCFMatrixBuffer):
    dataclass = PhasedVCFGenotypeEntry
    genotype_encoding = PhasedGenotypeRowEncoding


class PhasedHaplotypeVCFMatrixBuffer(VCFMatrixBuffer):
    dataclass = PhasedVCFHaplotypeEntry
    genotype_encoding = PhasedHaplotypeRowEncoding


class VCFHaplotypeBuffer(VCFBuffer2):
    """Alias buffer reading genotype columns as raw strings
    (reference: bionumpy/io/vcf_buffers.py:316-317)."""
