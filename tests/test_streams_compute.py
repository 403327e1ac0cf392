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


def test_fold_state_stays_on_device():
    """When per-chunk maps produce device arrays (here the binned
    pileup partial), the streamed fold accumulates in HBM — the
    jit-step + on-device-accumulator design (SURVEY §7b)."""
    import jax
    from bionumpy_tpu.ops.tracks import binned_pileup

    def chunk_bins(iv):
        import jax.numpy as jnp
        starts = jnp.asarray(np.asarray(iv.start, np.int32))
        stops = jnp.asarray(np.asarray(iv.stop, np.int32))
        return binned_pileup(starts, stops,
                             jnp.ones(len(starts), bool), 10, 10)

    from bionumpy_tpu.datatypes import Interval
    chunks = [Interval(["c"] * 3, [0, 15, 40], [10, 25, 90]),
              Interval(["c"] * 2, [5, 50], [8, 60])]
    from bionumpy_tpu.computation_graph import SUM, ReductionNode
    node = StreamNode(iter(chunks))
    total = ReductionNode(ComputationNode(chunk_bins, [node]), SUM)
    result = total.compute()
    assert isinstance(result, jax.Array)  # fold never left the device
    exp = np.zeros(100, np.int64)
    for c in chunks:
        for s, e in zip(np.asarray(c.start), np.asarray(c.stop)):
            exp[s:e] += 1
    np.testing.assert_array_equal(np.asarray(result),
                                  exp.reshape(10, 10).sum(axis=1))


def test_mixed_roots_single_pass():
    """Reductions and concat-style roots evaluate together in ONE pass
    (the reference had to forbid mixing; the push executor does not)."""
    pulls = []

    def counting():
        for i in range(3):
            pulls.append(i)
            yield np.full(4, float(i))

    node = StreamNode(counting())
    doubled = node * 2
    results = compute({"cat": doubled, "total": np.sum(doubled),
                       "mean": np.mean(node), "const": 7})
    assert pulls == [0, 1, 2]  # one pass, shared by all roots
    np.testing.assert_array_equal(
        results["cat"], np.repeat([0.0, 2.0, 4.0], 4))
    assert results["total"] == 24.0
    assert results["mean"] == 1.0
    assert results["const"] == 7


def test_shared_subexpression_evaluated_once():
    calls = []

    def spy(x):
        calls.append(1)
        return x + 1

    node = StreamNode(iter([np.arange(3), np.arange(3)]))
    shared = ComputationNode(spy, [node])
    a = np.sum(shared)
    b = np.sum(shared * 2)
    res = compute([a, b])
    assert len(calls) == 2  # once per chunk, not per consumer
    assert res[0] == 12 and res[1] == 24


def test_error_attribution_carries_build_site():
    node = StreamNode(iter([np.arange(3)]))
    bad = ComputationNode(lambda x: x[100], [node])
    from bionumpy_tpu.computation_graph import ComputationException
    with pytest.raises(ComputationException):
        bad.compute()


def test_histogram_stream_fold():
    chunks = [np.array([0.5, 1.5, 1.6]), np.array([2.5, 0.1])]
    node = StreamNode(iter(chunks))
    h = np.histogram(node, bins=np.array([0.0, 1.0, 2.0, 3.0]))
    counts, edges = compute(h)
    exp_c, exp_e = np.histogram(np.concatenate(chunks),
                                bins=np.array([0.0, 1.0, 2.0, 3.0]))
    np.testing.assert_array_equal(counts, exp_c)
    np.testing.assert_array_equal(edges, exp_e)


def test_graph_rowwise_mean_concatenates():
    """axis=-1 means map per chunk and concatenate (the reference's
    _rowmean route, reference: bionumpy/streams/reductions.py:46-57)."""
    from bionumpy_tpu.ragged import RaggedArray
    chunks = [RaggedArray(np.arange(6.0), [2, 4]),
              RaggedArray(np.arange(5.0), [5])]
    node = StreamNode(iter(chunks))
    got = np.asarray(node.mean(axis=-1).compute())
    np.testing.assert_allclose(got, [0.5, 3.5, 2.0])


def test_graph_streamed_quantile():
    chunks = [np.array([1, 2, 2, 3]), np.array([10, 2, 4])]
    node = StreamNode(iter(chunks))
    got = np.quantile(node, [0.5, 1.0])
    flat = np.concatenate(chunks)
    hist = np.bincount(flat)
    cum = np.cumsum(hist)
    want = np.searchsorted(cum, np.array([0.5, 1.0]) * cum[-1])
    np.testing.assert_array_equal(np.asarray(got.compute()), want)


def test_graph_streamed_bincount():
    chunks = [np.array([0, 1, 1]), np.array([5, 1])]
    node = StreamNode(iter(chunks))
    got = np.bincount(node).compute()
    np.testing.assert_array_equal(
        got, np.bincount(np.concatenate(chunks)))


def test_reduction_feeds_further_math_autocomputes():
    """A fold used as input to more math resolves eagerly (one pass),
    so sqrt(mean(x)) returns a concrete value."""
    chunks = [np.arange(10.0), np.arange(20.0)]
    node = StreamNode(iter(chunks))
    got = np.sqrt(np.mean(node))
    assert not isinstance(got, ComputationNode)
    np.testing.assert_allclose(
        float(got), np.sqrt(np.concatenate(chunks).mean()))


def test_reduction_into_live_stream_fails_loudly():
    """mean(x) - x over ONE generator source: the fold consumes the
    stream, and the remaining expression must fail loudly instead of
    silently returning partial data."""
    from bionumpy_tpu.computation_graph import ComputationException
    node = StreamNode(iter([np.arange(4.0), np.arange(6.0)]))
    centered = np.mean(node) - node
    with pytest.raises(ComputationException, match="empty stream"):
        compute(centered)


def test_two_reductions_compose_eagerly():
    a = StreamNode(iter([np.arange(4.0), np.arange(8.0)]))
    b = StreamNode(iter([np.ones(3), 2 * np.ones(5)]))
    got = np.mean(a) + np.sum(b)
    expected = np.concatenate([np.arange(4.0), np.arange(8.0)]).mean() \
        + 13.0
    np.testing.assert_allclose(float(got), expected)


def test_graph_streamed_max_min_std_var():
    """Whole-stream max/min/std/var fold across chunks (beyond the
    reference's sum/histogram/mean interceptions)."""
    chunks = [np.array([3.0, 7.0, 1.0]), np.array([9.0, 2.0])]
    flat = np.concatenate(chunks)

    def node():
        return StreamNode(iter([c.copy() for c in chunks]))

    assert float(np.max(node()).compute()) == flat.max()
    assert float(np.min(node()).compute()) == flat.min()
    np.testing.assert_allclose(float(np.var(node()).compute()),
                               flat.var())
    np.testing.assert_allclose(float(np.std(node()).compute()),
                               flat.std())
    # method forms + row-axis max still maps per chunk
    assert float(node().max().compute()) == flat.max()
    got = np.sqrt(np.var(node()))  # auto-computes, eager scalar
    np.testing.assert_allclose(float(got), flat.std())


def test_streamed_max_on_real_genomic_track(example_data):
    """np.max over a streamed genomic pileup equals the full track's
    max (the new whole-stream folds compose with the genomic layer)."""
    import bionumpy_tpu as bnp
    genome = bnp.Genome.from_file(str(example_data / "hg38.chrom.sizes"))
    bed = str(example_data / "ctcf_chr21-22.bed.gz")
    streamed = bnp.compute(
        np.max(genome.read_intervals(bed, stream=True).get_pileup()))
    full = np.max(genome.read_intervals(bed).get_pileup())
    assert float(np.asarray(streamed)) == float(np.asarray(full))
