"""Filter BAM alignments on mapq (reference workload: bam_filtering vs
samtools/pysam)."""
import bionumpy_tpu as bnp
import numpy as np


def filter_bam(input_file: str, min_mapq: int = 30):
    kept = 0
    total = 0
    for chunk in bnp.open(input_file).read_chunks():
        mask = np.asarray(chunk.mapq) >= min_mapq
        kept += int(mask.sum())
        total += len(chunk)
    return kept, total


if __name__ == "__main__":
    import sys
    print(filter_bam(sys.argv[1]))
