"""All-vs-all jaccard similarity of BED files (reference workload:
jaccard — beats BEDTools by keeping masks in memory)."""
import sys

import bionumpy_tpu as bnp
from bionumpy_tpu.genomic_data import Geometry


def jaccard_all_vs_all(chrom_sizes_file: str, bed_files):
    sizes = bnp.open(chrom_sizes_file).read()
    geom = Geometry.from_chrom_sizes(sizes)
    interval_sets = [geom.sort(bnp.open(f).read()) for f in bed_files]
    return geom.jaccard_all_vs_all(interval_sets)


if __name__ == "__main__":
    print(jaccard_all_vs_all(sys.argv[1], sys.argv[2:]))
