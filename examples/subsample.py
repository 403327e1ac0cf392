"""Subsample half the reads of a FASTQ file (reference workload:
subsample)."""
import numpy as np

import bionumpy_tpu as bnp


def subsample_file(input_file: str, output_file: str, fraction=0.5,
                   seed=1234):
    rng = np.random.default_rng(seed)
    out = bnp.open(output_file, "w")
    for chunk in bnp.open(input_file).read_chunks():
        mask = rng.random(len(chunk)) < fraction
        out.write(chunk[mask])
    out.close()


if __name__ == "__main__":
    import sys
    subsample_file(sys.argv[1], sys.argv[2])
