"""Behavior tests for the long tail of components: indexes, filters,
matchers, memory mapping, stream helpers, legacy geometry, CLI wrapper,
plotting and formatting utilities.

Mirrors the semantics of the reference's tests/test_bloom_filter.py,
test_debruijn.py, test_wildcard_index.py, test_string_matcher.py,
test_memory_mapping.py, test_streams.py, test_geometry.py, test_cli.py,
test_formating.py, test_util.py and test_pairs.py (reimplemented).
"""
import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.encoded_array import EncodedArray


@pytest.fixture
def dna_seqs():
    return bnp.as_encoded_array(
        ["ACGTACGT", "GGGTTTAC", "ACGT"], bnp.DNAEncoding)


class TestBloomFilter:
    def test_inserted_kmers_are_members(self, dna_seqs):
        from bionumpy_tpu.sequence.bloom_filter import (
            BloomFilter, hash_function)
        k = 3
        kmers = bnp.get_kmers(dna_seqs, k).raw().ravel()
        hashes = [hash_function(o) for o in (11, 503)]
        bf = BloomFilter.from_hash_functions_and_sequences(
            hashes, kmers, mask_size=4 ** k * 4)
        assert bool(np.all(bf[kmers]))

    def test_absent_kmers_mostly_rejected(self):
        from bionumpy_tpu.sequence.bloom_filter import (
            BloomFilter, hash_function)
        rng = np.random.default_rng(0)
        present = rng.integers(0, 4 ** 10, 100)
        absent = rng.integers(4 ** 10, 4 ** 11, 1000)
        hashes = [hash_function(o) for o in (11, 503, 9001)]
        bf = BloomFilter.from_hash_functions_and_sequences(
            hashes, present, mask_size=1 << 16)
        fp_rate = np.mean(bf[absent])
        assert fp_rate < 0.2

    def test_interleaved(self, dna_seqs):
        from bionumpy_tpu.sequence.bloom_filter import (
            InterleavedBloomFilter, hash_function)
        k = 3
        rows = [np.asarray(r, dtype=np.int64)
                for r in bnp.get_kmers(dna_seqs, k).raw()]
        hashes = [hash_function(o) for o in (11, 503)]
        ibf = InterleavedBloomFilter.from_hash_functions_and_sequences(
            hashes, rows, mask_size=4 ** k * 4)
        assert bool(np.all(ibf[rows[0], 0]))


class TestDeBruijn:
    def test_forward_backward(self):
        from bionumpy_tpu.sequence.debruijn import DeBruijnGraph
        g = DeBruijnGraph.from_sequences(
            bnp.as_encoded_array(["ACGTA"], bnp.DNAEncoding), k=3)
        nxt = g.forward("ACG")
        assert "CGT" in nxt
        prv = g.backward("CGT")
        assert "ACG" in prv

    def test_colored(self):
        from bionumpy_tpu.sequence.debruijn import ColoredDeBruijnGraph
        g = ColoredDeBruijnGraph.from_sequences(
            bnp.as_encoded_array(["ACGT", "CGTT"], bnp.DNAEncoding), k=3)
        colors = g["CGT"]  # k-mer present in both rows -> both colors
        assert set(colors) == {0, 1}


class TestIndexes:
    def test_kmer_lookup(self, dna_seqs):
        from bionumpy_tpu.sequence.indexing.kmer_indexing import KmerLookup
        lookup = KmerLookup.create_lookup(dna_seqs, k=3)
        seqs = lookup.get_sequences("ACG")
        assert len(seqs) == 2  # rows 0 and 2 contain ACG

    def test_wildcard_index(self, dna_seqs):
        from bionumpy_tpu.sequence.indexing.wildcard_index import (
            WildCardIndex)
        index = WildCardIndex.create_index(dna_seqs)
        hits = index.get_indices("A.G")
        assert 0 in hits and 2 in hits and 1 not in hits

    def test_lookup_2d(self):
        from bionumpy_tpu.sequence.lookup import Lookup
        table = Lookup(np.arange(16).reshape(4, 4), bnp.DNAEncoding)
        val = table["C", "G"]
        assert int(np.asarray(val).reshape(())) == 1 * 4 + 2


class TestStringMatchers:
    def test_wildcard_matcher(self):
        from bionumpy_tpu.sequence.string_matcher import (
            construct_wildcard_matcher)
        seqs = bnp.as_encoded_array(["ACGT", "AGGT"], bnp.DNAEncoding)
        m = construct_wildcard_matcher("A.G", bnp.DNAEncoding)
        hits = m.rolling_window(seqs)
        np.testing.assert_array_equal(np.asarray(hits.to_numpy_array()),
                                      [[True, False], [True, False]])

    def test_fixed_len_regex(self):
        from bionumpy_tpu.sequence.string_matcher import RegexMatcher
        seqs = bnp.as_encoded_array(["ACGT", "TTTT"], bnp.DNAEncoding)
        matcher = RegexMatcher("AC[GT]", encoding=bnp.DNAEncoding)
        hits = matcher.rolling_window(seqs, mode="same")
        assert bool(hits[0, 0]) is True
        assert not np.any(hits[1])

    def test_flexible_len_regex(self):
        from bionumpy_tpu.sequence.string_matcher import RegexMatcher
        seqs = bnp.as_encoded_array(["ACGGT", "ACT"], bnp.DNAEncoding)
        # .{m,n} gaps expand to ACT / AC.T / AC..T fixed matchers
        matcher = RegexMatcher("AC.{0,2}T", encoding=bnp.DNAEncoding)
        hits = matcher.rolling_window(seqs, mode="same")
        assert bool(np.any(hits[0]))
        assert bool(np.any(hits[1]))


class TestMemoryMapping:
    def test_roundtrip(self, tmp_path, dna_seqs):
        from bionumpy_tpu.streams.memory_mapping import (
            MemMapEncodedRaggedArray)
        base = str(tmp_path / "seqs")
        MemMapEncodedRaggedArray.create(lambda: iter([dna_seqs]), base)
        loaded = MemMapEncodedRaggedArray.load(base)
        assert loaded.tolist() == dna_seqs.tolist()
        assert loaded.encoding == dna_seqs.encoding


class TestStreamHelpers:
    def test_quantile(self):
        from bionumpy_tpu.streams import quantile
        from bionumpy_tpu.streams.stream import BnpStream
        chunks = BnpStream(iter([np.array([1, 2, 3]), np.array([4, 5])]))
        assert quantile(chunks, 0.5) == 3

    def test_histogram_stream(self):
        from bionumpy_tpu.streams import histogram
        from bionumpy_tpu.streams.stream import BnpStream
        chunks = BnpStream(
            iter([np.array([0.5, 1.5]), np.array([1.6, 2.5])]))
        counts, edges = histogram(chunks, bins=3, range=(0, 3))
        np.testing.assert_array_equal(counts, [1, 2, 1])

    def test_left_join(self):
        from bionumpy_tpu.streams.left_join import left_join
        left = [("chr1", 1), ("chr2", 2)]
        right = [("chr1", 10)]
        joined = [tuple(j) for j in left_join(iter(left), iter(right))]
        assert joined == [("chr1", 1, 10), ("chr2", 2, None)]

    def test_chromosome_map(self):
        from bionumpy_tpu.streams import chromosome_map, grouped_stream

        @chromosome_map(reduction=sum)
        def count(intervals):
            return len(intervals)

        grouped = grouped_stream(iter([("chr1", [1, 2]), ("chr2", [3])]))
        assert count(grouped) == 3


class TestGeometry:
    @pytest.fixture
    def geometry(self):
        from bionumpy_tpu.genomic_data.geometry import Geometry
        return Geometry({"chr1": 100, "chr2": 50})

    @pytest.fixture
    def intervals(self):
        return bnp.datatypes.Interval(chromosome=["chr1", "chr1", "chr2"],
                                      start=[0, 50, 10], stop=[20, 80, 30])

    def test_jaccard(self, geometry, intervals):
        assert geometry.jaccard(intervals, intervals) == pytest.approx(1.0)

    def test_pileup_and_mask(self, geometry, intervals):
        pileup = geometry.get_pileup(intervals)
        assert int(np.asarray(pileup["chr1"][10])) == 1
        mask = geometry.get_mask(intervals)
        assert bool(np.asarray(mask["chr2"][15]))

    def test_extend_to_size_and_clip(self, geometry):
        intervals = bnp.datatypes.Bed6(
            chromosome=["chr1", "chr1", "chr2"], start=[0, 50, 10],
            stop=[20, 80, 30], name=["a", "b", "c"], score=[0, 0, 0],
            strand=["+", "-", "+"])
        extended = geometry.extend_to_size(intervals, 40)
        assert np.all(extended.stop - extended.start <= 40 + 0)
        clipped = geometry.clip(extended)
        assert np.all(clipped.stop <= 100)
        assert np.all(clipped.start >= 0)

    def test_merge_and_sort(self, geometry):
        iv = bnp.datatypes.Interval(chromosome=["chr1", "chr1"],
                                    start=[10, 15], stop=[20, 30])
        merged = geometry.merge_intervals(iv)
        assert len(merged) == 1
        assert int(merged.stop[0]) == 30


class TestPairsFormat:
    PAIRS_TEXT = (
        "## pairs format v1.0\n"
        "#chromsize: chr1 100\n"
        "r1\tchr1\t10\tchr1\t50\t+\t-\n"
        "r2\tchr1\t20\tchr1\t60\t+\t+\n")

    def test_parse(self, tmp_path):
        path = tmp_path / "test.pairs"
        path.write_text(self.PAIRS_TEXT)
        data = bnp.open(str(path)).read()
        assert len(data) == 2
        assert list(data.pos1) == [10, 20]
        assert data.chrom2.tolist() == ["chr1", "chr1"]


class TestCli:
    def test_cli_wrapper_file_io(self, tmp_path):
        from bionumpy_tpu.cli import CliWrapper
        from bionumpy_tpu.datatypes import SequenceEntry

        def upper_names(entries: SequenceEntry) -> SequenceEntry:
            return entries

        wrapped = CliWrapper()(upper_names)
        src = tmp_path / "in.fa"
        src.write_text(">a\nACGT\n>b\nGGTT\n")
        out = tmp_path / "out.fa"
        wrapped(str(src), output=str(out))
        assert bnp.open(str(out)).read().sequence.tolist() == \
            ["ACGT", "GGTT"]


class TestPlotting:
    def test_plot_encoded_counts_smoke(self, dna_seqs, monkeypatch):
        matplotlib = pytest.importorskip("matplotlib")
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        monkeypatch.setattr(plt, "show", lambda: None)
        counts = bnp.count_encoded(dna_seqs.ravel())
        bnp.plot(counts)


class TestFormatting:
    def test_table(self):
        from bionumpy_tpu.util.formating import table
        text = table([("a", 1), ("b", 2)], headers=["name", "count"])
        assert "name" in text and "a" in text

    def test_interleave(self):
        from bionumpy_tpu.util import interleave
        out = interleave(np.array([1, 3]), np.array([2, 4]))
        np.testing.assert_array_equal(out, [1, 2, 3, 4])

    def test_is_subclass_or_instance(self):
        from bionumpy_tpu.util import is_subclass_or_instance
        assert is_subclass_or_instance(bnp.DNAEncoding,
                                       type(bnp.DNAEncoding))


class TestParityAdditions:
    def test_flat_pileup_bedgraph(self):
        from bionumpy_tpu.arithmetics.intervals import pileup
        iv = bnp.datatypes.Interval(chromosome=["chr1"] * 3,
                                    start=[0, 2, 10], stop=[5, 7, 12])
        bg = pileup(iv)
        # depth: [0,2)=1, [2,5)=2, [5,7)=1, [10,12)=1
        assert list(bg.start) == [0, 2, 5, 7, 10]
        assert list(bg.value) == [1, 2, 1, 0, 1]

    def test_delimited_buffer_entries(self):
        from bionumpy_tpu.io.delimited_buffers import BedBuffer
        text = "chr1\t1\t5\nchr2\t2\t8\n"
        buf = BedBuffer.from_raw_buffer(
            np.frombuffer(text.encode(), dtype=np.uint8))
        entries = buf.entries
        assert entries.tolist() == ["chr1\t1\t5\n", "chr2\t2\t8\n"]

    def test_gfa_path_buffer(self):
        from bionumpy_tpu.io.gfa import GfaPathBuffer
        text = "P\tpath1\t11+,12-,13+\t*\nP\tpath2\t21-,22+\t*\n"
        buf = GfaPathBuffer.from_raw_buffer(
            np.frombuffer(text.encode(), dtype=np.uint8))
        data = buf.get_data()
        assert data.name.tolist() == ["path1", "path2"]
        assert data.node_ids.tolist() == [[11, 12, 13], [21, 22]]
        assert data.directions.tolist() == [[1, -1, 1], [-1, 1]]

    def test_debruijn_contigs_and_kmers(self):
        from bionumpy_tpu.sequence.debruijn import DeBruijnGraph
        g = DeBruijnGraph.from_sequences(
            bnp.as_encoded_array(["ACGTT"], bnp.DNAEncoding), k=3)
        assert "ACG" in g.kmers
        contigs = g.get_contigs()
        assert any("ACGTT" in c for c in contigs)

    def test_snp_encoding_decode(self):
        from bionumpy_tpu.variants.mutation_signature import SNPEncoding
        labels = SNPEncoding.decode(np.array([0, 3]))
        assert list(labels) == ["C>A", "T>A"]

    def test_convolution_decorator(self):
        from bionumpy_tpu.sequence.kmers import convolution

        @convolution
        def window_sum(flat, w):
            raw = np.asarray(flat.raw()).astype(int)
            out = np.zeros(len(raw), dtype=int)
            for i in range(w):
                out += np.roll(raw, -i)
            return out

        seqs = bnp.as_encoded_array(["ACGT", "AC"], bnp.DNAEncoding)
        result = window_sum(seqs, 2)
        assert result.tolist() == [[1, 3, 5], [1]]

    def test_simulate_rng_seed(self):
        from bionumpy_tpu.simulate import rng
        rng.seed(42)
        a = rng.default_rng().integers(0, 100, 5)
        rng.seed(42)
        b = rng.default_rng().integers(0, 100, 5)
        np.testing.assert_array_equal(a, b)

    def test_vcf_haplotype_buffer_importable(self):
        from bionumpy_tpu.io.vcf_buffers import (
            PhasedHaplotypeVCFMatrixBuffer, VCFHaplotypeBuffer)
        assert VCFHaplotypeBuffer.dataclass is not None
        assert PhasedHaplotypeVCFMatrixBuffer.dataclass is not None


def test_rolling_window_function_parity():
    """reference util.rolling_window_function semantics: ragged rows
    trim the last w-1 windows; flat input keeps its n-w+1 windows."""
    from bionumpy_tpu.util import rolling_window_function
    from bionumpy_tpu.ragged import RaggedArray

    @rolling_window_function
    def windowed_sum(windows, w):
        return windows.sum(axis=-1)

    ra = RaggedArray(np.arange(10), [4, 6])
    out = windowed_sum(ra, 3)
    assert [list(np.asarray(r).ravel()) for r in out] == \
        [[3, 6], [15, 18, 21, 24]]
    np.testing.assert_array_equal(windowed_sum(np.arange(6), 3),
                                  [3, 6, 9, 12])


def test_util_pprint_and_plot():
    from bionumpy_tpu.util import plot, pprint, pprint_one
    from bionumpy_tpu.ragged import RaggedArray
    codes = np.frombuffer(b"ACGT", np.uint8)
    assert pprint_one(codes) == "ACGT"
    assert pprint(RaggedArray(codes, [2, 2])) == ["AC", "GT"]
    assert plot(object()) is None  # warns on missing __plot__


def test_submodule_namespace_parity():
    """Names a reference user reaches through submodules resolve here
    too (module-level audit; backend swaps raise by design)."""
    import importlib
    import pytest as _pytest
    for sub, names in {
            "genomic_data": ["ignore_underscores", "keep_all"],
            "io": ["read_matrix", "read_motif"],
            "util": ["rolling_window_function", "pprint", "pprint_one",
                     "plot", "testing", "as_strided", "interleave"],
    }.items():
        mod = importlib.import_module(f"bionumpy_tpu.{sub}")
        for name in names:
            assert hasattr(mod, name), (sub, name)
    from bionumpy_tpu import encodings, sequence
    for mod in (encodings, sequence):
        with _pytest.raises(NotImplementedError):
            mod.set_backend(None)
    import bionumpy_tpu as bnp
    assert bnp.nps.RaggedArray is bnp.RaggedArray
