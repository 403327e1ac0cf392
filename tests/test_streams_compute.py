"""Streaming + computation-graph behavior (reference:
tests around bionumpy/computation_graph.py and streams/)."""
import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.computation_graph import (ComputationNode, StreamNode,
                                            compute)
from bionumpy_tpu.streams import (BnpStream, MultiStream, chunk_entries,
                                  groupby, streamable)


def test_streamable_reduction():
    @streamable(sum)
    def total(x):
        return int(np.sum(x))

    stream = BnpStream(iter([np.arange(5), np.arange(3)]))
    assert total(stream) == 13
    assert total(np.arange(5)) == 10


def test_bincount_stream():
    stream = BnpStream(iter([np.array([0, 1, 1]), np.array([2, 2, 2, 5])]))
    counts = bnp.bincount(stream)
    np.testing.assert_array_equal(counts, [1, 2, 3, 0, 0, 1])


def test_mean_stream():
    stream = BnpStream(iter([np.arange(10.0), np.arange(5.0)]))
    result = bnp.mean(stream)
    expected = np.concatenate([np.arange(10.0), np.arange(5.0)]).mean()
    np.testing.assert_allclose(np.asarray(result)[()], expected)


def test_groupby_cross_chunk_merge():
    from bionumpy_tpu.datatypes import Interval
    chunk1 = Interval(["chr1", "chr1", "chr2"], [1, 2, 3], [5, 6, 7])
    chunk2 = Interval(["chr2", "chr3"], [4, 5], [8, 9])
    stream = bnp.streams.NpDataclassStream(iter([chunk1, chunk2]),
                                           dataclass=Interval)
    groups = list(groupby(stream, "chromosome"))
    names = [name for name, _ in groups]
    sizes = [len(data) for _, data in groups]
    assert names == ["chr1", "chr2", "chr3"]
    assert sizes == [2, 2, 1]


def test_chunk_entries():
    from bionumpy_tpu.datatypes import Interval
    chunks = [Interval(["c"] * n, list(range(n)), list(range(1, n + 1)))
              for n in (3, 4, 2)]
    stream = bnp.streams.NpDataclassStream(iter(chunks),
                                           dataclass=Interval)
    rechunked = list(chunk_entries(stream, 4))
    assert [len(c) for c in rechunked] == [4, 4, 1]


def test_computation_graph_single_pass():
    chunks = [np.arange(10.0), np.arange(20.0)]
    node = StreamNode(iter(chunks))
    doubled = node * 2
    total = np.sum(doubled)
    mean_val = np.mean(node)
    results = compute({"total": total, "mean": mean_val})
    expected_all = np.concatenate(chunks)
    assert results["total"] == expected_all.sum() * 2
    np.testing.assert_allclose(results["mean"], expected_all.mean())


def test_computation_graph_elementwise_concat():
    chunks = [np.arange(5), np.arange(3)]
    node = StreamNode(iter(chunks))
    shifted = node + 100
    out = compute(shifted)
    np.testing.assert_array_equal(
        out, np.concatenate([c + 100 for c in chunks]))


def test_multistream_fill_missing():
    from bionumpy_tpu.datatypes import Interval
    stream = bnp.streams.NpDataclassStream(
        iter([Interval(["chr1"], [0], [5]),
              Interval(["chr3"], [1], [4])]), dataclass=Interval)
    ms = MultiStream({"chr1": 10, "chr2": 20, "chr3": 30},
                     intervals=stream)
    groups = list(ms.intervals)
    assert [len(g) for g in groups] == [1, 0, 1]


def test_multistream_sort_order_error():
    from bionumpy_tpu.datatypes import Interval
    from bionumpy_tpu.streams import StreamError
    stream = bnp.streams.NpDataclassStream(
        iter([Interval(["chr2"], [0], [5]),
              Interval(["chr1"], [1], [4])]), dataclass=Interval)
    ms = MultiStream({"chr1": 10, "chr2": 20}, intervals=stream)
    with pytest.raises(StreamError):
        list(ms.intervals)


def test_genomic_streamed_mean_pipeline(example_data):
    """stream=True track math evaluates lazily in one pass."""
    genome = bnp.Genome.from_dict({"chr1": 100, "chr2": 50})
    from bionumpy_tpu.datatypes import BedGraph
    chunks = [BedGraph(["chr1"], [0], [100], [2.0]),
              BedGraph(["chr2"], [0], [50], [4.0])]
    stream = bnp.streams.NpDataclassStream(iter(chunks),
                                           dataclass=BedGraph)
    track = bnp.genomic_data.GenomicArray.from_bedgraph(
        stream, genome.get_genome_context())
    total = np.sum(track * 2)
    result = compute(total)
    assert result == 2 * (100 * 2.0 + 50 * 4.0)
