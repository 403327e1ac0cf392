"""Per-chunk GC content of a sequence file (reference workload:
gc_by_chunks_example)."""
import numpy as np

import bionumpy_tpu as bnp


def gc_content(input_file: str) -> float:
    total_gc = 0
    total = 0
    for chunk in bnp.open(input_file).read_chunks():
        seq = bnp.as_encoded_array(chunk.sequence, bnp.DNAEncoding)
        gc = np.asarray(((seq == "G") | (seq == "C")).sum(axis=-1)).sum()
        total_gc += int(gc)
        total += int(np.asarray(seq.lengths).sum())
    return total_gc / total


if __name__ == "__main__":
    import sys
    print(gc_content(sys.argv[1]))
