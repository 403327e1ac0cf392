import numpy as np
import pytest

from bionumpy_tpu.datatypes import BedGraph, Interval, LocationEntry
from bionumpy_tpu.genomic_data import (BinnedGenome, Genome, GenomeContext,
                                       GlobalOffset)


@pytest.fixture
def genome():
    return Genome.from_dict({"chr1": 20, "chr2": 10})


@pytest.fixture
def intervals():
    return Interval(chromosome=["chr1", "chr1", "chr2"], start=[0, 10, 0],
                    stop=[5, 15, 5])


def test_get_track_golden(genome):
    bedgraph = BedGraph(chromosome=["chr1", "chr1", "chr2"],
                        start=[0, 10, 0], stop=[5, 15, 5], value=[1, 2, 3])
    track = genome.get_track(bedgraph)
    np.testing.assert_array_equal(
        track["chr1"].to_array(),
        [1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 2, 2, 2, 2, 2, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(track["chr2"].to_array(),
                                  [3, 3, 3, 3, 3, 0, 0, 0, 0, 0])
    assert track.sum() == 30


def test_pileup_and_mask(genome, intervals):
    gi = genome.get_intervals(intervals)
    pileup = gi.get_pileup()
    np.testing.assert_array_equal(
        pileup["chr1"].to_array(),
        [1] * 5 + [0] * 5 + [1] * 5 + [0] * 5)
    mask = gi.get_mask()
    np.testing.assert_array_equal(mask["chr2"].to_array(),
                                  [True] * 5 + [False] * 5)


def test_track_extraction(genome, intervals):
    bedgraph = BedGraph(["chr1", "chr1", "chr2"], [0, 10, 0], [5, 15, 5],
                        [1, 2, 3])
    track = genome.get_track(bedgraph)
    rows = track.extract_intervals(Interval(["chr1", "chr2"], [0, 0],
                                            [8, 5]))
    assert rows[0].to_array().tolist() == [1, 1, 1, 1, 1, 0, 0, 0]
    assert rows[1].to_array().tolist() == [3, 3, 3, 3, 3]
    np.testing.assert_array_equal(rows.sum(axis=-1), [5, 15])


def test_track_arithmetic(genome):
    bedgraph = BedGraph(["chr1", "chr1", "chr2"], [0, 10, 0], [5, 15, 5],
                        [1, 2, 3])
    track = genome.get_track(bedgraph)
    doubled = track * 2
    assert doubled.sum() == 60
    masked = track > 1
    np.testing.assert_array_equal(masked["chr2"].to_array(),
                                  [True] * 5 + [False] * 5)


def test_locations_and_windows(genome):
    locs = genome.get_locations(LocationEntry(["chr1", "chr2"], [3, 2]))
    windows = locs.get_windows(flank=4)
    np.testing.assert_array_equal(windows.start, [0, 0])
    np.testing.assert_array_equal(windows.stop, [8, 7])


def test_global_offset():
    go = GlobalOffset({"chr1": 100, "chr2": 50})
    np.testing.assert_array_equal(go.get_offset(["chr2", "chr1"]), [100, 0])
    iv = Interval(["chr2"], [10], [20])
    gi = go.from_local_interval(iv)
    np.testing.assert_array_equal(gi.start, [110])
    back = go.to_local_interval(gi)
    np.testing.assert_array_equal(back.start, [10])
    assert back.chromosome.encoding.to_string(int(back.chromosome.raw()[0])) \
        == "chr2"


def test_genome_context_masking():
    ctx = GenomeContext.from_dict({"chr1": 100, "chr1_alt": 50})
    data = Interval(["chr1", "chr1_alt", "chr1"], [0, 0, 5], [10, 10, 15])
    masked = ctx.mask_data(data)
    assert len(masked) == 2


def test_genome_from_fasta(example_data, tmp_path):
    import shutil
    fasta = tmp_path / "small_sequence.fa"
    shutil.copy(example_data / "small_sequence.fa", fasta)
    genome = Genome.from_file(str(fasta))
    assert list(genome.get_genome_context().chrom_sizes.keys()) == \
        ["chr1", "chr2", "chr3"]
    seq = genome.read_sequence()
    chrom1 = seq["chr1"]
    assert len(chrom1) == genome.get_genome_context().chrom_sizes["chr1"]


def test_read_intervals_and_annotation(example_data):
    genome = Genome.from_file(str(example_data / "small.chrom.sizes"))
    # use intervals on the same contig naming
    intervals = genome.read_intervals(str(example_data /
                                          "small_summits.bed"))
    assert len(intervals) > 0
    merged = intervals.merged()
    assert len(merged) <= len(intervals)


def test_streamed_pileup_matches_full(genome, intervals):
    gi_full = genome.get_intervals(intervals)
    full_pileup = gi_full.get_pileup()
    streamed = gi_full.as_stream().get_pileup()
    streamed_computed = streamed.compute()
    np.testing.assert_array_equal(full_pileup["chr1"].to_array(),
                                  streamed_computed["chr1"].to_array())
    np.testing.assert_array_equal(full_pileup["chr2"].to_array(),
                                  streamed_computed["chr2"].to_array())


def test_binned_genome(genome):
    binned = BinnedGenome(genome.get_genome_context(), bin_size=5)
    binned.count(LocationEntry(["chr1", "chr1", "chr2"], [1, 7, 3]))
    np.testing.assert_array_equal(binned["chr1"], [1, 1, 0, 0])
    np.testing.assert_array_equal(binned["chr2"], [1, 0])


def test_map_locations(genome):
    from bionumpy_tpu.datatypes import NamedInterval
    intervals = NamedInterval(["chr1", "chr1"], [5, 12], [11, 18],
                              ["a", "b"])
    gi = genome.get_intervals(intervals)
    locations = LocationEntry(["chr1", "chr1"], [6, 13])
    mapped = gi.map_locations(locations)
    assert mapped.chromosome.tolist() == ["a", "b"]
    np.testing.assert_array_equal(mapped.position, [1, 1])


def test_read_intervals_stream_matches_full(example_data):
    # stream=True must route a chunk stream through from_interval_stream
    # without any attribute probe consuming chunks (a hasattr() on a
    # one-look-ahead NpDataclassStream eats its first chunk)
    import bionumpy_tpu as bnp
    genome = bnp.Genome.from_file(example_data / "chr21-22.chrom.sizes")
    bed = str(example_data / "ctcf_chr21-22.bed.gz")
    full = genome.read_intervals(bed).get_pileup()
    streamed = genome.read_intervals(bed, stream=True).get_pileup()
    full_mean = float(np.asarray(np.mean(full, axis=None)))
    stream_mean = float(np.asarray(bnp.compute(np.mean(streamed, axis=None))))
    assert np.isclose(full_mean, stream_mean)
    assert full_mean > 0


def test_read_track_stream_matches_full(example_data):
    import bionumpy_tpu as bnp
    genome = bnp.Genome.from_dict({"chr1": 20000})
    bdg = str(example_data / "small.bdg")
    s_stream = float(np.asarray(bnp.compute(
        np.sum(genome.read_track(bdg, stream=True)))))
    s_full = float(np.asarray(np.sum(genome.read_track(bdg))))
    assert np.isclose(s_stream, s_full)
    assert s_full > 0


def test_to_bedgraph_roundtrip(genome):
    bedgraph = BedGraph(chromosome=["chr1", "chr1", "chr2"],
                        start=[0, 10, 0], stop=[5, 15, 5], value=[1, 2, 3])
    track = genome.get_track(bedgraph)
    out = track.to_bedgraph()
    # round-trip: reading the produced bedgraph back yields the same track
    track2 = genome.get_track(out)
    np.testing.assert_array_equal(track["chr1"].to_array(),
                                  track2["chr1"].to_array())
    np.testing.assert_array_equal(track["chr2"].to_array(),
                                  track2["chr2"].to_array())


def test_streamed_locations_windows(genome, intervals):
    streamed = genome.get_intervals(intervals).as_stream()
    locations = streamed.get_location("start")
    from bionumpy_tpu.genomic_data.genomic_intervals import (
        GenomicLocationStreamed)
    assert isinstance(locations, GenomicLocationStreamed)
    windows = locations.get_windows(flank=2)
    full = windows.compute()
    # same result as the non-streamed path
    want = genome.get_intervals(intervals).get_location("start") \
        .get_windows(flank=2)
    np.testing.assert_array_equal(np.asarray(full.start),
                                  np.asarray(want.data.start))
    np.testing.assert_array_equal(np.asarray(full.stop),
                                  np.asarray(want.data.stop))


def test_streamed_locations_compute(genome, intervals):
    streamed = genome.get_intervals(intervals).as_stream()
    locs = streamed.get_location("start").compute()
    np.testing.assert_array_equal(np.asarray(locs.position), [0, 10, 0])


def test_get_sorted_stream(genome):
    iv = Interval(chromosome=["chr2", "chr1", "chr1"], start=[0, 10, 0],
                  stop=[5, 15, 5])
    stream = genome.get_intervals(iv).get_sorted_stream()
    full = stream.compute()
    assert np.asarray(full.data.start).tolist() == [0, 10, 0]
    assert full.data.chromosome.tolist() == ["chr1", "chr1", "chr2"]


def test_genomic_array_node_from_dict_and_locations(genome):
    from bionumpy_tpu.arithmetics.intervals import GenomicRunLengthArray
    d = {"chr1": GenomicRunLengthArray.from_array(
            np.arange(20, dtype=float)),
         "chr2": GenomicRunLengthArray.from_array(
            np.arange(10, dtype=float))}
    from bionumpy_tpu.genomic_data.genomic_track import (GenomicArrayGlobal,
                                                         GenomicArrayNode)
    node = GenomicArrayNode.from_dict(d)
    full = node.compute()
    np.testing.assert_array_equal(full["chr1"].to_array(), np.arange(20))
    glob = GenomicArrayGlobal.from_dict(d)
    np.testing.assert_array_equal(glob["chr2"].to_array(), np.arange(10))
