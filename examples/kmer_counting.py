"""Streaming k-mer counting (reference workload:
scripts/kmer_counting_example.py, benchmarks/rules/kmer_counting.smk)."""
import bionumpy_tpu as bnp


def count_kmers(sequence_entries, k: int = 5) -> bnp.EncodedCounts:
    sequence = bnp.as_encoded_array(sequence_entries, bnp.DNAEncoding)
    return bnp.count_kmers(sequence, k)


def count_all_kmers(input_file: str, output_file: str, k: int = 5):
    buffer_type = bnp.TwoLineFastaBuffer \
        if input_file.endswith((".fa", ".fa.gz")) else None
    stream = bnp.open(input_file, buffer_type=buffer_type).read_chunks()
    kmers = sum(count_kmers(chunk.sequence, k) for chunk in stream)
    with open(output_file, "w") as f:
        f.writelines(f"{kmer}\t{count}\n"
                     for kmer, count in sorted(zip(kmers.alphabet,
                                                   kmers.counts)))


if __name__ == "__main__":
    import sys
    count_all_kmers(sys.argv[1], sys.argv[2])
