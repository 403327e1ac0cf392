"""End-to-end workloads mirroring the driver's measured configs
(BASELINE.json): per-base composition, 31-mer counting, minimizers + GC
track, PWM motif matching, SBS96 + intersect/jaccard.  Golden values are
recomputed with independent plain-numpy code."""
import gzip

import numpy as np
import pytest

import bionumpy_tpu as bnp
from bionumpy_tpu.encodings.alphabet_encoding import ACGTnEncoding


@pytest.fixture(scope="module")
def big_fastq(example_data):
    return bnp.open(str(example_data / "big.fq.gz")).read()


@pytest.fixture(scope="module")
def dna_seqs(big_fastq):
    return bnp.change_encoding(big_fastq.sequence, bnp.DNAEncoding)


def test_config1_composition(big_fastq, dna_seqs):
    """FASTQ read + per-base composition."""
    counts = bnp.count_encoded(dna_seqs, axis=None)
    # independent recompute from raw text
    raw = np.asarray(big_fastq.sequence.ravel().raw())
    for i, base in enumerate("ACGT"):
        assert counts.counts[i] == int((raw == ord(base)).sum())
    g_count = int(np.asarray((dna_seqs == "G").sum(axis=-1)).sum())
    assert g_count == counts.counts[2]


def test_config2_31mer_exactness(dna_seqs):
    """31-mer hashes on big.fq.gz: spot-check rows against the plain
    polynomial, verify total count."""
    kmers = bnp.get_kmers(dna_seqs, 31)
    lengths = np.asarray(dna_seqs.lengths)
    assert int(np.asarray(kmers.lengths).sum()) == \
        int(np.maximum(lengths - 30, 0).sum())
    powers = 4 ** np.arange(31, dtype=np.int64)
    for row_idx in (0, 1, 500, 999):
        row = np.asarray(dna_seqs[row_idx].raw()).astype(np.int64)
        got = np.asarray(kmers[row_idx].raw())
        want = np.array([
            int((row[i: i + 31] * powers).sum())
            for i in range(len(row) - 30)], dtype=np.int64)
        np.testing.assert_array_equal(got, want)


def test_config2_unique_31mer_stats(dna_seqs):
    import jax.numpy as jnp
    from bionumpy_tpu.ops.kmers import (kmer_hashes_masked, prepare_codes,
                                        unique_kmer_stats)
    flat = np.asarray(dna_seqs.ravel().raw())
    lengths = np.asarray(dna_seqs.lengths)
    codes, dist, n = prepare_codes(flat, lengths)
    lo, hi, valid = kmer_hashes_masked(jnp.asarray(codes),
                                       jnp.asarray(dist), 31)
    n_unique, n_valid = unique_kmer_stats(lo, hi, valid)
    hashes = (np.asarray(lo).astype(np.uint64) |
              (np.asarray(hi).astype(np.uint64) << np.uint64(32)))
    ref_valid = np.asarray(valid)
    assert int(n_valid) == int(ref_valid.sum())
    assert int(n_unique) == len(np.unique(hashes[ref_valid]))


def test_config3_minimizers_and_gc_track(example_data):
    """Minimizers (k=21, w=30) on sacCer3 chrI + GC content binning."""
    fa = bnp.open(str(example_data / "sacCer3.fa.gz"),
                  buffer_type=bnp.MultiLineFastaBuffer).read()
    seq = bnp.change_encoding(fa.sequence[0:1], ACGTnEncoding)
    seq_dna = bnp.EncodedRaggedArray(
        bnp.EncodedArray(np.asarray(seq.ravel().raw()) % 4,
                         bnp.DNAEncoding), seq.lengths)
    minimizers = bnp.get_minimizers(seq_dna, 21, 30)
    assert int(np.asarray(minimizers.lengths)[0]) == \
        int(seq.lengths[0]) - 30 + 1
    # windowed min spot check
    kmers = np.asarray(bnp.get_kmers(seq_dna, 21)[0].raw())
    got = np.asarray(minimizers[0].raw())
    for i in (0, 1000, 50000):
        assert got[i] == kmers[i: i + 10].min()
    # GC per 1000bp bin
    raw = np.asarray(seq.ravel().raw())
    gc = (raw == 1) | (raw == 2)
    bins = np.add.reduceat(gc, np.arange(0, len(gc), 1000))
    assert bins.sum() == gc.sum()


def test_config4_pwm_match_positions(example_data):
    """MA0080.1 scan: match positions against a plain-numpy scan."""
    from bionumpy_tpu.io.jaspar import read_jaspar_matrix
    pwm = read_jaspar_matrix(str(example_data / "MA0080.1.jaspar"))
    reads = bnp.open(str(example_data / "big.fq.gz")).read()
    seqs = bnp.change_encoding(reads.sequence[:100], bnp.DNAEncoding)
    scores = bnp.get_motif_scores(seqs, pwm)
    threshold = 6.0
    got_positions = [np.flatnonzero(np.asarray(row) > threshold)
                     for row in scores]
    matrix = pwm.matrix
    w = pwm.window_size
    for row_idx in range(100):  # every read, not a sample
        codes = np.asarray(seqs[row_idx].raw())
        want = []
        for i in range(len(codes) - w + 1):
            score = matrix[codes[i: i + w], np.arange(w)].sum()
            if score > threshold:
                want.append(i)
        np.testing.assert_array_equal(got_positions[row_idx], want)


def test_config5_sbs96_and_intersect(example_data):
    """SBS96 on 1000Genomes chr21-22 VCF against a simulated reference,
    plus intersect/jaccard on real BED pairs."""
    variants = bnp.open(
        str(example_data / "1000Genomes_chr21-22.vcf.gz")).read()
    n = len(variants)
    assert n > 0
    is_snp = np.asarray(variants.ref_seq.lengths == 1) & \
        np.asarray(variants.alt_seq.lengths == 1)
    snps = variants[is_snp]
    # simulated reference consistent with the refs at variant positions
    rng = np.random.default_rng(0)
    max_pos = int(np.asarray(variants.position).max()) + 10
    chrom_names = sorted(set(variants.chromosome.tolist()))
    ref = {}
    for name in chrom_names:
        seq = rng.integers(0, 4, max_pos).astype(np.uint8)
        mask = np.asarray(snps.chromosome.tolist()) == name
        positions = np.asarray(snps.position)[mask]
        ref_codes = bnp.DNAEncoding.encode(
            snps[mask].ref_seq.ravel()).raw()
        seq[positions] = ref_codes
        alphabet = "ACGT"
        ref[name] = "".join(alphabet[c] for c in seq)
    genome = bnp.Genome.from_dict({name: max_pos for name in chrom_names})
    sequence = bnp.genomic_data.GenomicSequence.from_dict(ref)
    locations = genome.get_locations(
        bnp.LocationEntry(snps.chromosome, snps.position))

    class _Vars:
        def __init__(self, loc, var):
            self._loc, self._var = loc, var

        def get_data_field(self, name):
            if name in ("chromosome", "position"):
                return getattr(self._loc, name)
            return getattr(self._var, name)

        def __getitem__(self, idx):
            return _Vars(self._loc[idx], self._var[idx])

        def get_windows(self, flank):
            return self._loc.get_windows(flank=flank)

    from bionumpy_tpu.variants import count_mutation_types_genomic
    counts = count_mutation_types_genomic(_Vars(locations, snps), sequence)
    assert len(counts.alphabet) == 96

    # GOLDEN check: the full 96-vector against an independent pure-
    # python twin (string contexts + strand collapse via a dict), the
    # reference's validate_equal bar (reference:
    # benchmarks/config.yml:79-117)
    import collections as _coll
    comp = str.maketrans("ACGT", "TGCA")
    expected = _coll.Counter()
    chrom_l = snps.chromosome.tolist()
    pos_l = np.asarray(snps.position).tolist()
    alt_l = snps.alt_seq.tolist()
    for name, pos, alt in zip(chrom_l, pos_l, alt_l):
        context = ref[name][pos - 1: pos + 2]
        if len(context) < 3 or "N" in context:
            continue
        if context[1] in "CT":
            ctx, a = context, alt
        else:
            ctx = context.translate(comp)[::-1]
            a = alt.translate(comp)
        expected[f"{ctx[0]}[{ctx[1]}>{a}]{ctx[2]}"] += 1
    want = np.array([expected[label] for label in counts.alphabet])
    assert want.sum() == len(snps)
    np.testing.assert_array_equal(np.asarray(counts.counts), want)

    # intersect / jaccard on real bed pair
    a = bnp.open(str(example_data / "ctcf_chr21-22.bed.gz")).read()
    chroms = {"chr21": 46709983, "chr22": 50818468}
    from bionumpy_tpu.genomic_data import Geometry
    geom = Geometry(chroms)
    sorted_a = geom.sort(a)
    j = geom.jaccard(sorted_a, sorted_a)
    assert j == pytest.approx(1.0)
    mask = geom.get_global_mask(sorted_a)
    dense_cover = int(mask.sum())
    # coverage equals union length of intervals computed independently
    import collections
    by_chrom = collections.defaultdict(list)
    starts = np.asarray(a.start)
    stops = np.asarray(a.stop)
    for name, s, e in zip(a.chromosome.tolist(), starts, stops):
        by_chrom[name].append((s, e))
    union = 0
    for name, ivs in by_chrom.items():
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                union += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        union += cur_e - cur_s
    assert dense_cover == union


def test_config5_jaccard_two_different_files(example_data):
    """Jaccard between ctcf and znf263 peaks on chr21-22 against an
    independent dense-mask recompute (two DIFFERENT files, not the
    self-comparison; reference protocol: benchmarks/config.yml:57-77)."""
    chroms = {"chr21": 46709983, "chr22": 50818468}
    from bionumpy_tpu.genomic_data import Geometry
    geom = Geometry(chroms)

    def load(name):
        data = bnp.open(str(example_data / name)).read()
        keep = np.isin(np.asarray(data.chromosome.tolist()),
                       list(chroms))
        return geom.sort(data[keep])

    a = load("ctcf_chr21-22.bed.gz")
    b = load("znf263.bed.gz")
    got = geom.jaccard(a, b)

    # independent recompute: dense boolean coverage per chromosome
    inter = union = 0
    for name, size in chroms.items():
        masks = []
        for data in (a, b):
            sel = np.asarray(data.chromosome.tolist()) == name
            m = np.zeros(size, bool)
            for s, e in zip(np.asarray(data.start)[sel],
                            np.asarray(data.stop)[sel]):
                m[s:e] = True
            masks.append(m)
        inter += int((masks[0] & masks[1]).sum())
        union += int((masks[0] | masks[1]).sum())
    expected = inter / union
    assert 0 < expected < 1  # genuinely different files
    assert got == pytest.approx(expected, abs=1e-12)
