"""ChIP-seq read simulation from a JASPAR motif over simulated
chromosomes (reference workload: scripts/simulation_example.py)."""
import numpy as np

import bionumpy_tpu as bnp
from bionumpy_tpu.arithmetics import get_pileup
from bionumpy_tpu.io.motifs import read_motif
from bionumpy_tpu.simulate.chipseq import (ChipSeqSimulationSettings,
                                           simulate_chip_seq_reads,
                                           simulate_sequence)


def simulate(motif_filename: str, chromosome_sizes: dict,
             fragment_length: int = 100, read_length: int = 36,
             coverage: int = 10):
    motif = read_motif(motif_filename)
    settings = ChipSeqSimulationSettings(motif, fragment_length,
                                         read_length, coverage)
    sequences = {name: simulate_sequence("acgt", size)
                 for name, size in chromosome_sizes.items()}
    multistream = bnp.MultiStream(chromosome_sizes, sequences=sequences)
    reads = simulate_chip_seq_reads(multistream.sequences, settings,
                                    multistream.sequence_names)
    return list(reads)


def simulated_pileup_maxima(motif_filename: str,
                            chromosome_sizes: dict) -> list:
    """Max pileup depth per chromosome of the simulated reads."""
    reads = simulate(motif_filename, chromosome_sizes)
    maxima = []
    for chrom_reads, size in zip(reads, chromosome_sizes.values()):
        pileup = get_pileup(chrom_reads, size)
        maxima.append(int(np.max(pileup.to_array())))
    return maxima


if __name__ == "__main__":
    import sys
    print(simulated_pileup_maxima(sys.argv[1],
                                  {"chr1": 1000, "chr2": 2000}))
