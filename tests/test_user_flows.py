"""Tutorial-style combined flows: each test chains several subsystems
the way the reference's documentation does (read -> filter -> write,
streamed graph folds, genome tracks + window extraction, VCF INFO,
simulation -> revcomp -> counting) — integration coverage beyond the
per-module suites."""
import numpy as np
import pytest

import bionumpy_tpu as bnp

EX = "/root/reference/example_data"


def test_quality_filter_write_roundtrip(tmp_path):
    out = str(tmp_path / "filtered.fq")
    n_in = n_out = 0
    with bnp.open(out, "w") as w:
        for chunk in bnp.open(f"{EX}/big.fq.gz").read_chunks(
                min_chunk_size=50_000):
            n_in += len(chunk)
            mask = np.asarray(chunk.quality.mean(axis=-1)) > 10
            sub = chunk[mask]
            n_out += len(sub)
            w.write(sub)
    back = bnp.open(out).read()
    assert len(back) == n_out
    assert 0 < n_out < n_in


def test_streamed_multi_output_single_pass():
    from bionumpy_tpu.computation_graph import StreamNode, compute
    stream = bnp.open(f"{EX}/big.fq.gz").read_chunks(
        min_chunk_size=50_000)
    node = StreamNode(iter(np.asarray(c.sequence.lengths)
                           for c in stream))
    mean_len, hist = compute((np.mean(node),
                              np.histogram(node, bins=8,
                                           range=(0, 1200))))
    exp = np.asarray(
        bnp.open(f"{EX}/big.fq.gz").read().sequence.lengths)
    assert mean_len == pytest.approx(exp.mean())
    assert np.array_equal(
        hist[0], np.histogram(exp, bins=8, range=(0, 1200))[0])


def test_pileup_window_extraction():
    genome = bnp.Genome.from_file(f"{EX}/hg38.chrom.sizes",
                                  filter_function=None)
    peaks = genome.read_intervals(f"{EX}/ctcf_chr21-22.bed.gz")
    track = peaks.get_pileup()
    windows = peaks.get_location("center").get_windows(flank=50)
    sigs = track[windows]
    m = np.asarray(sigs.mean(axis=-1))
    assert len(m) == len(peaks)
    # every peak center window must see its own peak's coverage
    assert (m > 0).all()


def test_simulate_revcomp_kmer_chain():
    from bionumpy_tpu.simulate import simulate_sequences
    rng = np.random.default_rng(1)
    sim = simulate_sequences(
        "ACGT", {f"s{i}": int(n)
                 for i, n in enumerate(rng.integers(40, 60, 20))},
        rng=rng)
    rc = bnp.get_reverse_complement(sim.sequence)
    k = 5
    k1 = bnp.count_kmers(bnp.as_encoded_array(
        sim.sequence.tolist(), bnp.DNAEncoding), k)
    k2 = bnp.count_kmers(bnp.as_encoded_array(
        rc.tolist(), bnp.DNAEncoding), k)
    assert int(np.asarray(k1.counts).sum()) == \
        int(np.asarray(k2.counts).sum())
    # revcomp bijects kmer multiset: count(X in fwd) == count(rc(X) in rc)
    c1 = np.asarray(k1.counts)
    c2 = np.asarray(k2.counts)

    def rc_hash(h):
        out = 0
        for _ in range(k):
            out = (out << 2) | (3 - (h & 3))
            h >>= 2
        return out

    for h in np.flatnonzero(c1):
        assert c2[rc_hash(int(h))] == c1[h]
