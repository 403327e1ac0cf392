"""Histogram of read lengths (reference workload:
sequence_length_distribution)."""
import numpy as np

import bionumpy_tpu as bnp


def length_distribution(input_file: str) -> np.ndarray:
    stream = bnp.open(input_file).read_chunks()
    return bnp.bincount(
        (np.asarray(chunk.sequence.lengths) for chunk in stream))


if __name__ == "__main__":
    import sys
    counts = length_distribution(sys.argv[1])
    for length in np.flatnonzero(counts):
        print(length, counts[length])
