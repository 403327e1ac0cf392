"""Reverse-complement a FASTQ file (reference workload:
benchmarks/config.yml reverse_complement)."""
import bionumpy_tpu as bnp


def reverse_complement_file(input_file: str, output_file: str):
    out = bnp.open(output_file, "w")
    for chunk in bnp.open(input_file).read_chunks():
        out.write(bnp.get_reverse_complement(chunk))
    out.close()


if __name__ == "__main__":
    import sys
    reverse_complement_file(sys.argv[1], sys.argv[2])
