"""Forbes similarity of two interval sets over a genome
(reference workload: scripts/forbes_example.py)."""
import numpy as np

import bionumpy_tpu as bnp


def calculate_forbes(chrom_sizes_file: str, filename_a: str,
                     filename_b: str) -> float:
    genome = bnp.Genome.from_file(chrom_sizes_file)
    a_mask = genome.read_intervals(filename_a).get_mask()
    b_mask = genome.read_intervals(filename_b).get_mask()
    observed_intersection = float(np.asarray((b_mask & a_mask).sum()))
    expected_intersection = (float(np.asarray(a_mask.sum())) *
                             float(np.asarray(b_mask.sum()))) / genome.size
    return observed_intersection / expected_intersection


if __name__ == "__main__":
    import sys
    print(calculate_forbes(*sys.argv[1:4]))
