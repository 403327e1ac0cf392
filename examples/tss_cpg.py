"""CpG proportion around transcription start sites
(reference workload: scripts/tss_plot.py cpg_plot)."""
import numpy as np

import bionumpy_tpu as bnp


def tss_cpg_profile(fasta_filename: str, annotation_filename: str,
                    flank: int = 100) -> np.ndarray:
    """Mean per-position 'CG' occurrence over windows around every TSS."""
    genome = bnp.Genome.from_file(fasta_filename, sort_names=False)
    reference_sequence = genome.read_sequence()
    annotation = genome.read_annotation(annotation_filename)
    tss = annotation.transcripts.get_location("start").sorted()
    windows = tss.get_windows(flank=flank)
    window_sequences = reference_sequence[windows]
    return np.asarray(
        bnp.sequence.match_string(window_sequences, "CG").mean(axis=0))


if __name__ == "__main__":
    import sys
    profile = tss_cpg_profile(sys.argv[1], sys.argv[2])
    print(profile.mean(), profile.max())
