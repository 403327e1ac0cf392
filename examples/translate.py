"""Translate DNA fasta to protein (reference workload: translate)."""
import bionumpy_tpu as bnp


def translate_file(input_file: str, output_file: str):
    out = bnp.open(output_file, "w")
    for chunk in bnp.open(input_file).read_chunks():
        out.write(bnp.translate_dna_to_protein(chunk))
    out.close()


if __name__ == "__main__":
    import sys
    translate_file(sys.argv[1], sys.argv[2])
