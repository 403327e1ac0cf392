"""Parity gates against the SECOND independent oracle (tools/oracle2):
dict-of-strings k-mer counting and arithmetic SBS96 binning that share
no code or algorithmic structure with the framework or with
tools/make_golden.py (VERDICT r4 item 6; the reference's analog is the
benchmark pipeline's validate_equal diffs vs jellyfish/bcftools,
/root/reference/benchmarks/config.yml:79-117 — no external binary is
installable here, see BASELINE.md)."""
import json
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import oracle2  # noqa: E402

EX = pathlib.Path("/root/reference/example_data")
GOLDEN = pathlib.Path(__file__).parent / "golden"


def test_kmer_full_table_vs_string_oracle():
    """FULL 31-mer table of big.fq.gz: framework device pipeline vs the
    dict-of-python-strings count (every distinct kmer, not a top-N)."""
    from bionumpy_tpu.pipeline import count_kmers_fastq
    counts, stats = count_kmers_fastq(str(EX / "big.fq.gz"), 31,
                                      cap=1 << 17)
    oracle = oracle2.kmer_hash_table(str(EX / "big.fq.gz"), 31)
    assert stats["n_kmers"] == sum(oracle.values())
    assert len(counts.counts) == len(oracle)
    got = dict(zip(np.asarray(counts.label_codes,
                              np.uint64).tolist(),
                   np.asarray(counts.counts).tolist()))
    assert got == oracle


def test_kmer_oracle_agrees_with_golden_top100():
    """Cross-oracle agreement: oracle2 vs make_golden's pinned top100."""
    g = json.load(open(GOLDEN / "kmer_top100.json"))
    oracle = oracle2.kmer_hash_table(str(EX / g["file"]), g["k"])
    assert sum(oracle.values()) == g["n_total"]
    assert len(oracle) == g["n_distinct"]
    for h, c in g["top100"]:
        assert oracle[h] == c


def test_sbs96_arithmetic_oracle():
    """SBS96 96-vector three ways: arithmetic-binning oracle2 vs the
    pinned golden vector vs the framework pipeline."""
    g = json.load(open(GOLDEN / "sbs96_vector.json"))
    # reconstruct the simulated reference (input definition, seed 0 —
    # identical to make_golden/test_workloads by design)
    import gzip
    chrom_l, pos_l, ref_l = [], [], []
    for line in gzip.open(EX / "1000Genomes_chr21-22.vcf.gz", "rt"):
        if line.startswith("#"):
            continue
        f = line.split("\t", 5)
        if len(f[3]) == 1 and len(f[4]) == 1:
            chrom_l.append(f[0])
            pos_l.append(int(f[1]) - 1)
            ref_l.append(f[3])
    rng = np.random.default_rng(g["rng_seed"])
    max_pos = max(pos_l) + 10
    code = np.full(256, 255, np.uint8)
    for i, b in enumerate(b"ACGT"):
        code[b] = i
    chrom_arr = np.array(chrom_l)
    pos_arr = np.array(pos_l)
    refs = code[np.frombuffer("".join(ref_l).encode(), np.uint8)]
    ref_codes = {}
    for name in sorted(set(chrom_l)):
        seq = rng.integers(0, 4, max_pos).astype(np.uint8)
        m = chrom_arr == name
        seq[pos_arr[m]] = refs[m]
        ref_codes[name] = seq

    bins = oracle2.sbs96_arithmetic(
        str(EX / "1000Genomes_chr21-22.vcf.gz"), ref_codes)
    by_label = {oracle2.sbs96_label(b): bins[b] for b in range(96)}
    # vs the pinned golden vector (made by the OTHER oracle)
    assert by_label == dict(zip(g["labels"], g["counts"]))

    # vs the framework pipeline on the same inputs
    import bionumpy_tpu as bnp
    from bionumpy_tpu.genomic_data import GenomicSequence
    from bionumpy_tpu.variants import count_mutation_types_genomic
    alpha = np.frombuffer(b"ACGT", np.uint8)
    sequence = GenomicSequence.from_dict(
        {n: bytes(alpha[c]).decode() for n, c in ref_codes.items()})
    genome = bnp.Genome.from_dict({n: max_pos for n in ref_codes})
    variants = bnp.open(str(EX / "1000Genomes_chr21-22.vcf.gz")).read()
    is_snp = np.asarray(variants.ref_seq.lengths == 1) & \
        np.asarray(variants.alt_seq.lengths == 1)
    snps = variants[is_snp]
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

    counts = count_mutation_types_genomic(_Vars(locations, snps),
                                          sequence)
    got = dict(zip(counts.alphabet, np.asarray(counts.counts).tolist()))
    assert got == by_label
