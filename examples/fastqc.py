"""FastQC-style per-position quality statistics (reference workload:
scripts/fastqc_example.py)."""
import numpy as np

import bionumpy_tpu as bnp


def quality_stats(input_file: str):
    """Mean quality per read-position and GC per read, streamed."""
    position_sums = np.zeros(0)
    position_counts = np.zeros(0, dtype=np.int64)
    gc_counts = []
    for chunk in bnp.open(input_file).read_chunks():
        quality = chunk.quality
        lengths = np.asarray(quality.lengths)
        width = int(lengths.max())
        if len(position_sums) < width:
            position_sums = np.pad(position_sums,
                                   (0, width - len(position_sums)))
            position_counts = np.pad(position_counts,
                                     (0, width - len(position_counts)))
        padded = quality.as_padded_matrix(fill_value=0, width=width)
        mask = np.arange(width)[None, :] < lengths[:, None]
        position_sums[:width] += padded.sum(axis=0)
        position_counts[:width] += mask.sum(axis=0)
        seqs = bnp.as_encoded_array(chunk.sequence, bnp.DNAEncoding)
        gc = np.asarray(((seqs == "G") | (seqs == "C")).sum(axis=-1))
        gc_counts.append(gc / np.maximum(lengths, 1))
    mean_quality = position_sums / np.maximum(position_counts, 1)
    return mean_quality, np.concatenate(gc_counts)


if __name__ == "__main__":
    import sys
    mean_quality, gc = quality_stats(sys.argv[1])
    print("mean quality (first 20 positions):",
          np.round(mean_quality[:20], 2))
    print("mean GC:", round(float(gc.mean()), 4))
