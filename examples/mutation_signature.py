"""SBS96 mutation signature counting over a VCF + reference genome
(reference workload: scripts/mutation_signature_example.py)."""
import bionumpy_tpu as bnp
from bionumpy_tpu.variants import count_mutation_types_genomic


def count_signatures(vcf_file: str, fasta_file: str, flank: int = 1):
    genome = bnp.Genome.from_file(fasta_file)
    variants = genome.read_locations(vcf_file, has_numeric_chromosomes=False)
    reference = genome.read_sequence()
    return count_mutation_types_genomic(variants, reference, flank=flank)


if __name__ == "__main__":
    import sys
    counts = count_signatures(sys.argv[1], sys.argv[2])
    for label, count in zip(counts.alphabet, counts.counts):
        print(label, count)
