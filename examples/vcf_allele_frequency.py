"""Filter VCF variants by INFO allele frequency
(reference workload: scripts/vcf_allele_frequency_filtering_example.py)."""
import numpy as np

import bionumpy_tpu as bnp


def filter_by_allele_frequency(input_file: str, output_file: str,
                               min_af: float = 0.005):
    with bnp.open(output_file, "w") as out:
        for chunk in bnp.open(input_file).read_chunks():
            af = chunk.info.AF
            # multi-allelic rows carry one AF per alt allele; keep the row
            # if any allele passes
            max_af = np.asarray(af.max(axis=-1)) if hasattr(af, "lengths") \
                else np.asarray(af)
            out.write(chunk[max_af >= min_af])


if __name__ == "__main__":
    import sys
    filter_by_allele_frequency(sys.argv[1], sys.argv[2])
