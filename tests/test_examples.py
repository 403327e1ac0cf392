"""Run the example scripts end-to-end on real example data (the
reference treats its scripts as integration tests — SURVEY §4)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/examples")


def test_kmer_counting_example(example_data, tmp_path):
    from kmer_counting import count_all_kmers
    out = tmp_path / "counts.tsv"
    count_all_kmers(str(example_data / "big.fq.gz"), str(out), k=3)
    lines = out.read_text().splitlines()
    assert len(lines) == 64
    counts = {line.split("\t")[0]: int(line.split("\t")[1])
              for line in lines}
    assert sum(counts.values()) > 0


def test_reverse_complement_example(example_data, tmp_path):
    from reverse_complement import reverse_complement_file
    out = tmp_path / "rc.fq"
    reverse_complement_file(str(example_data / "reads.fq"), str(out))
    import bionumpy_tpu as bnp
    orig = bnp.open(str(example_data / "reads.fq")).read()
    rc = bnp.open(str(out)).read()
    assert rc.sequence[0].to_string() == \
        bnp.get_reverse_complement(
            bnp.as_encoded_array(orig.sequence[0].to_string(),
                                 bnp.DNAEncoding)).to_string()


def test_translate_example(example_data, tmp_path):
    from translate import translate_file
    out = tmp_path / "protein.fa"
    translate_file(str(example_data / "dna_translatable.fa"), str(out))
    import bionumpy_tpu as bnp
    prot = bnp.open(str(out), buffer_type=bnp.MultiLineFastaBuffer).read()
    assert len(prot) > 0


def test_subsample_example(example_data, tmp_path):
    from subsample import subsample_file
    out = tmp_path / "sub.fq"
    subsample_file(str(example_data / "big.fq.gz"), str(out))
    import bionumpy_tpu as bnp
    sub = bnp.open(str(out)).read()
    assert 300 < len(sub) < 700


def test_jaccard_example(example_data):
    from jaccard_all_vs_all import jaccard_all_vs_all
    matrix = jaccard_all_vs_all(
        str(example_data / "chr21-22.chrom.sizes"),
        [str(example_data / "ctcf_chr21-22.bed.gz"),
         str(example_data / "ctcf_chr21-22.bed.gz")])
    np.testing.assert_allclose(matrix, np.ones((2, 2)))


def test_bam_filtering_example(example_data):
    from bam_filtering import filter_bam
    kept, total = filter_bam(str(example_data / "ctcf_chr21-22.bam"))
    assert 0 < kept <= total


def test_length_distribution_example(example_data):
    from sequence_length_distribution import length_distribution
    counts = length_distribution(str(example_data / "big.fq.gz"))
    assert counts.sum() == 1000


def test_gc_content_example(example_data):
    from gc_content import gc_content
    gc = gc_content(str(example_data / "big.fq.gz"))
    assert 0.3 < gc < 0.7


def test_unique_intersect_example(example_data, tmp_path):
    from unique_intersect import unique_intersect_files
    out = tmp_path / "out.bed"
    unique_intersect_files(str(example_data / "ctcf_chr21-22.bed.gz"),
                           str(example_data / "ctcf_chr21-22.bed.gz"),
                           str(example_data / "chr21-22.chrom.sizes"),
                           str(out))
    import bionumpy_tpu as bnp
    result = bnp.open(str(out)).read()
    assert len(result) > 0


def test_mutation_signature_example(example_data, tmp_path):
    import shutil
    from mutation_signature import count_signatures
    fasta = tmp_path / "small_genome.fa"
    shutil.copy(example_data / "small_genome.fa", fasta)
    shutil.copy(example_data / "small_genome.fa.fai",
                tmp_path / "small_genome.fa.fai")
    # make a small VCF consistent with the genome
    import bionumpy_tpu as bnp
    genome = bnp.Genome.from_file(str(fasta))
    seq = genome.read_sequence()
    chrom = list(genome.get_genome_context().chrom_sizes)[0]
    chrom_seq = seq[chrom].to_string().upper()
    positions = [10, 50, 100]
    alt = {"A": "C", "C": "A", "G": "T", "T": "G"}
    vcf_lines = ["##fileformat=VCFv4.2",
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for pos in positions:
        ref = chrom_seq[pos]
        vcf_lines.append(
            f"{chrom}\t{pos + 1}\t.\t{ref}\t{alt[ref]}\t.\t.\t.")
    vcf_path = tmp_path / "variants.vcf"
    vcf_path.write_text("\n".join(vcf_lines) + "\n")
    counts = count_signatures(str(vcf_path), str(fasta))
    assert counts.counts.sum() == len(positions)


def test_fastqc_example(example_data):
    from fastqc import quality_stats
    mean_quality, gc = quality_stats(str(example_data / "big.fq.gz"))
    assert len(gc) == 1000
    assert 0 < mean_quality[0] < 42
    assert 0.2 < gc.mean() < 0.8


def test_peak_pileup_example(example_data):
    from peak_pileup import high_peaks, peak_scores, region_pileup
    cs = str(example_data / "chr21-22.chrom.sizes")
    bam = str(example_data / "ctcf_chr21-22.bam")
    bed = str(example_data / "ctcf_chr21-22.bed.gz")
    region = region_pileup(cs, bam, "chr22", 19970400, 19970800)
    assert region.shape == (400,) and region.max() > 0
    scores = peak_scores(cs, bam, bed)
    assert scores.shape == (1535,)
    high = high_peaks(cs, bam, bed, min_depth=5)
    assert 0 < len(high.get_data()) < 1535


def test_tss_cpg_example(example_data, tmp_path):
    import gzip
    import shutil
    from tss_cpg import tss_cpg_profile
    fa = tmp_path / "sacCer3.fa"
    gtf = tmp_path / "sacCer3.gtf"
    for src, dst in [("sacCer3.fa.gz", fa), ("sacCer3.ensGene.gtf.gz", gtf)]:
        with gzip.open(example_data / src, "rb") as fin, \
                open(dst, "wb") as fout:
            shutil.copyfileobj(fin, fout)
    profile = tss_cpg_profile(str(fa), str(gtf), flank=100)
    assert profile.shape == (200,)
    assert 0 < profile.mean() < 1


def test_simulate_chipseq_example(example_data):
    from simulate_chipseq import simulated_pileup_maxima
    maxima = simulated_pileup_maxima(
        str(example_data / "MA0080.1.jaspar"),
        {"chr1": 1000, "chr2": 2000})
    assert len(maxima) == 2
    assert all(m > 0 for m in maxima)


def test_kmer_index_example(example_data):
    from kmer_index import sequences_with_kmer
    hits = sequences_with_kmer(str(example_data / "airr.tsv"), "TGC")
    assert len(hits) == 100


def test_gtf_transcripts_example(example_data):
    from gtf_transcripts import positive_strand_transcripts
    pos = positive_strand_transcripts(str(example_data / "small.gtf"))
    assert len(pos) == 1
    assert pos.strand.ravel().to_string() == "+"


def test_vcf_allele_frequency_example(example_data, tmp_path):
    from vcf_allele_frequency import filter_by_allele_frequency
    out = tmp_path / "filtered.vcf"
    filter_by_allele_frequency(str(example_data / "variants_with_af.vcf"),
                               str(out), min_af=0.3)
    import bionumpy_tpu as bnp
    n_in = bnp.count_entries(str(example_data / "variants_with_af.vcf"))
    n_out = bnp.count_entries(str(out))
    assert 0 < n_out < n_in


def test_forbes_example(example_data):
    from forbes_similarity import calculate_forbes
    value = calculate_forbes(str(example_data / "hg38.chrom.sizes"),
                             str(example_data / "ctcf.bed.gz"),
                             str(example_data / "znf263.bed.gz"))
    assert value > 1  # co-occurring TF binding sites


def test_mesh_pipelines_example():
    from mesh_pipelines import main
    main(4)  # tests/conftest provides the 8-virtual-device CPU mesh
