"""Record-model behaviors: @bnpdataclass coercion/extension, lazy
dataclasses, EncodedCounts algebra, StringArray ops.

Semantics mirror the reference's tests/test_bnpdataclass.py,
tests/test_lazybnpdataclass.py, tests/test_encodedcounts.py and
tests/test_string_array.py (reimplemented, golden values recomputed).
"""
import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.bnpdataclass import (BNPDataClass, bnpdataclass,
                                       make_dataclass, narrow_type, replace)
from bionumpy_tpu.encoded_array import EncodedRaggedArray
from bionumpy_tpu.sequence.count_encoded import EncodedCounts
from bionumpy_tpu.string_array import StringArray


@bnpdataclass
class Person:
    name: str
    age: int


@pytest.fixture
def people():
    return Person(name=["alice", "bob", "carol"], age=[10, 20, 30])


class TestBnpDataclass:
    def test_field_coercion(self, people):
        assert isinstance(people.name, EncodedRaggedArray)
        assert people.age.dtype.kind == "i"
        assert people.name.tolist() == ["alice", "bob", "carol"]

    def test_indexing_whole_records(self, people):
        sub = people[[0, 2]]
        assert sub.name.tolist() == ["alice", "carol"]
        assert list(sub.age) == [10, 30]
        one = people[1]
        assert one.name.tolist() == "bob"  # scalar index -> single entry

    def test_boolean_mask(self, people):
        young = people[people.age < 25]
        assert len(young) == 2
        assert young.name.tolist() == ["alice", "bob"]

    def test_from_entry_tuples(self):
        p = Person.from_entry_tuples([("x", 1), ("yy", 2)])
        assert p.name.tolist() == ["x", "yy"]
        assert list(p.age) == [1, 2]

    def test_empty(self):
        e = Person.empty()
        assert len(e) == 0
        assert len(np.concatenate([e, Person(name=["a"], age=[1])])) == 1

    def test_concatenate(self, people):
        both = np.concatenate([people, people])
        assert len(both) == 6
        assert both.name.tolist() == ["alice", "bob", "carol"] * 2

    def test_equality(self, people):
        assert people == Person(name=["alice", "bob", "carol"],
                                age=[10, 20, 30])
        assert not (people == people[[0, 1]])

    def test_todict_from_dict(self, people):
        d = people.todict()
        assert set(d) == {"name", "age"}
        back = Person.from_dict(d)
        assert back == people

    def test_tolist_toiter(self, people):
        rows = people.tolist()
        assert rows[0].name == "alice" and rows[0].age == 10
        assert next(people.toiter()).name == "alice"

    def test_topandas_roundtrip(self, people):
        pd = pytest.importorskip("pandas")
        df = people.topandas()
        assert isinstance(df, pd.DataFrame)
        assert list(df["age"]) == [10, 20, 30]
        back = Person.from_data_frame(df)
        assert back == people

    def test_add_fields(self, people):
        extended = people.add_fields({"score": np.array([1.0, 2.0, 3.0])},
                                     {"score": float})
        assert list(extended.score) == [1.0, 2.0, 3.0]
        assert extended.name.tolist() == people.name.tolist()

    def test_extend_class(self):
        Extended = Person.extend((("city", str),))
        x = Extended(name=["a"], age=[5], city=["oslo"])
        assert x.city.tolist() == ["oslo"]

    def test_sort_by(self, people):
        s = people.sort_by("age")
        assert list(s.age) == [10, 20, 30]
        s2 = people[[2, 0, 1]].sort_by("age")
        assert s2.name.tolist() == ["alice", "bob", "carol"]

    def test_replace(self, people):
        p2 = replace(people, age=np.array([1, 2, 3]))
        assert list(p2.age) == [1, 2, 3]
        assert p2.name.tolist() == people.name.tolist()

    def test_make_dataclass_dynamic(self):
        DC = make_dataclass([("chrom", str), ("pos", int)], name="Loc")
        loc = DC(chrom=["chr1"], pos=[7])
        assert issubclass(DC, BNPDataClass)
        assert list(loc.pos) == [7]

    def test_narrow_type(self):
        Narrow = narrow_type(bnp.datatypes.Interval, "chromosome", str)
        iv = Narrow(chromosome=["chr1"], start=[0], stop=[10])
        assert iv.chromosome.tolist() == ["chr1"]

    def test_nested_list_int_field(self):
        from typing import List

        @bnpdataclass
        class WithList:
            name: str
            values: List[int]

        w = WithList(name=["a", "b"], values=[[1, 2], [3]])
        assert w.values.tolist() == [[1, 2], [3]]

    def test_astype(self, people):
        Extended = Person.extend((("city", str),))
        x = Extended(name=["a"], age=[5], city=["oslo"])
        back = x.astype(Person)
        assert back.name.tolist() == ["a"]
        assert not hasattr(back, "city") or back.__class__ is Person

    def test_context(self, people):
        people.set_context("source", "unit-test")
        assert people.has_context("source")
        assert people.get_context("source") == "unit-test"


class TestLazyDataclass:
    @pytest.fixture
    def lazy_chunk(self):
        reader = bnp.open("/root/reference/example_data/big.fq.gz",
                          lazy=True)
        return reader.read_chunk()

    def test_lazy_attribute_parse(self, lazy_chunk):
        assert len(lazy_chunk.sequence) == len(lazy_chunk)

    def test_setattr_overlay(self, lazy_chunk):
        n = len(lazy_chunk)
        lazy_chunk.name = bnp.as_encoded_array(["x"] * n)
        assert lazy_chunk.name.tolist() == ["x"] * n
        # other fields still parse from the retained buffer
        assert len(lazy_chunk.sequence) == n

    def test_slicing_keeps_laziness(self, lazy_chunk):
        sub = lazy_chunk[:5]
        assert len(sub) == 5
        assert len(sub.sequence) == 5

    def test_get_data_object(self, lazy_chunk):
        eager = lazy_chunk.get_data_object()
        assert isinstance(eager, BNPDataClass)
        assert len(eager) == len(lazy_chunk)

    def test_boolean_filter_stays_lazy(self):
        """Boolean indexing must not materialize: no buffer byte
        gather, and only the ACCESSED field parses (VERDICT r4 item 2
        pins this — the eager gather was ~28% of the SBS96 job)."""
        vcf = "/root/reference/example_data/1000Genomes_chr21-22.vcf.gz"
        variants = bnp.open(vcf, lazy=True).read()
        ig = variants._itemgetter
        parsed = []
        orig_call = type(ig).__call__
        orig_getitem = type(ig._buffer).__getitem__
        gathers = []

        def counting_call(self, name):
            parsed.append(name)
            return orig_call(self, name)

        def counting_getitem(self, idx):
            gathers.append(idx)
            return orig_getitem(self, idx)

        type(ig).__call__ = counting_call
        type(ig._buffer).__getitem__ = counting_getitem
        try:
            mask = np.zeros(len(variants), bool)
            mask[: len(mask) // 2] = True
            sub = variants[mask]
            pos = sub.position
        finally:
            type(ig).__call__ = orig_call
            type(ig._buffer).__getitem__ = orig_getitem
        assert parsed == ["position"], parsed  # only the accessed field
        assert gathers == [], gathers          # and NO buffer slicing
        assert len(pos) == int(mask.sum())
        # the values match the eagerly-parsed column
        full = bnp.open(vcf, lazy=True).read().position
        assert np.array_equal(np.asarray(pos), np.asarray(full)[mask])

    def test_unmodified_write_through(self, tmp_path, lazy_chunk):
        out = tmp_path / "out.fq"
        with bnp.open(str(out), "w") as f:
            f.write(lazy_chunk)
        import gzip
        raw = gzip.open("/root/reference/example_data/big.fq.gz").read()
        assert out.read_bytes() == raw

    def test_modified_field_reserializes(self, tmp_path, lazy_chunk):
        n = len(lazy_chunk)
        lazy_chunk.name = bnp.as_encoded_array([f"r{i}" for i in range(n)])
        out = tmp_path / "mod.fq"
        with bnp.open(str(out), "w") as f:
            f.write(lazy_chunk)
        again = bnp.open(str(out)).read()
        assert again.name.tolist() == [f"r{i}" for i in range(n)]
        assert again.sequence.tolist() == lazy_chunk.sequence.tolist()


class TestEncodedCounts:
    def test_add_aligns_alphabet(self):
        a = EncodedCounts(["A", "C"], np.array([1, 2]))
        b = EncodedCounts(["A", "C"], np.array([10, 20]))
        assert list((a + b).counts) == [11, 22]

    def test_add_scalar(self):
        a = EncodedCounts(["A", "C"], np.array([1, 2]))
        assert list((a + 1).counts) == [2, 3]

    def test_ufunc(self):
        a = EncodedCounts(["A", "C"], np.array([1, 2]))
        doubled = np.multiply(a, 2)
        assert list(doubled.counts) == [2, 4]

    def test_getitem_label(self):
        a = EncodedCounts(["A", "C", "G"], np.array([5, 6, 7]))
        assert int(a["G"]) == 7

    def test_labels_and_proportions(self):
        a = EncodedCounts(["A", "C"], np.array([1, 3]))
        assert a.labels == ["A", "C"]
        np.testing.assert_allclose(a.proportions, [0.25, 0.75])

    def test_vstack_and_row_names(self):
        a = EncodedCounts(["A", "C"], np.array([1, 2]))
        b = EncodedCounts(["A", "C"], np.array([3, 4]))
        stacked = EncodedCounts.vstack([a, b])
        assert stacked.counts.shape == (2, 2)

    def test_most_common_order(self):
        a = EncodedCounts(["A", "C", "G"], np.array([2, 9, 4]))
        top = a.most_common(2)
        assert top.alphabet == ["C", "G"]
        assert list(top.counts) == [9, 4]

    def test_as_dict(self):
        a = EncodedCounts(["A", "C"], np.array([1, 2]))
        assert a.as_dict() == {"A": 1, "C": 2}


class TestStringArray:
    def test_equality_with_str(self):
        s = StringArray(["chr1", "chr2", "chr1"])
        np.testing.assert_array_equal(s == "chr1", [True, False, True])
        np.testing.assert_array_equal(s != "chr1", [False, True, False])

    def test_isin(self):
        s = StringArray(["a", "b", "c"])
        np.testing.assert_array_equal(np.isin(s, ["a", "c"]),
                                      [True, False, True])

    def test_concatenate(self):
        s = np.concatenate([StringArray(["a"]), StringArray(["bb"])])
        assert isinstance(s, StringArray)
        assert s.tolist() == ["a", "bb"]

    def test_lengths(self):
        s = StringArray(["a", "bbb", ""])
        np.testing.assert_array_equal(s.lengths, [1, 3, 0])

    def test_indexing(self):
        s = StringArray(["a", "b", "c"])
        assert s[1:].tolist() == ["b", "c"]
        assert s[np.array([0, 2])].tolist() == ["a", "c"]
