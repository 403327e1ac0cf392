"""Read pileup from a BAM file, sliced by region and scored per peak
(reference workload: scripts/peak_pileup_example.py)."""
import numpy as np

import bionumpy_tpu as bnp


def region_pileup(chrom_sizes: str, bam: str, chromosome: str,
                  start: int, stop: int) -> np.ndarray:
    """Dense read-depth over one region of the genome."""
    genome = bnp.Genome.from_file(chrom_sizes)
    reads = genome.read_intervals(bam)
    pileup = reads.get_pileup()
    return pileup[chromosome][start:stop].to_array()


def peak_scores(chrom_sizes: str, bam: str, peaks_bed: str) -> np.ndarray:
    """Max read depth inside each peak."""
    genome = bnp.Genome.from_file(chrom_sizes)
    pileup = genome.read_intervals(bam).get_pileup()
    peaks = genome.read_intervals(peaks_bed)
    peak_pileup = pileup[peaks]
    return np.asarray(np.max(peak_pileup, axis=-1))


def high_peaks(chrom_sizes: str, bam: str, peaks_bed: str,
               min_depth: int = 5):
    """Peaks whose max read depth reaches `min_depth`."""
    genome = bnp.Genome.from_file(chrom_sizes)
    peaks = genome.read_intervals(peaks_bed)
    scores = peak_scores(chrom_sizes, bam, peaks_bed)
    return peaks[scores >= min_depth]


if __name__ == "__main__":
    import sys
    print(peak_scores(*sys.argv[1:4]).mean())
