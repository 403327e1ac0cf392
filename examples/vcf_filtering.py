"""Filter VCF by allele count / allele frequency from INFO (reference
workload: vcf_filtering vs bcftools)."""
import bionumpy_tpu as bnp


def filter_by_allele_count(input_file: str, output_file: str,
                           min_ac: int = 10):
    out = bnp.open(output_file, "w")
    for chunk in bnp.open(input_file).read_chunks():
        ac = chunk.info.AC
        if hasattr(ac, "ravel"):
            first_ac = [row[0] if len(row) else 0 for row in ac.tolist()]
            import numpy as np
            mask = np.array(first_ac) >= min_ac
        else:
            mask = ac >= min_ac
        out.write(chunk[mask])
    out.close()


if __name__ == "__main__":
    import sys
    filter_by_allele_count(sys.argv[1], sys.argv[2])
