"""Entries of BED a overlapping any interval of BED b (reference
workload: unique_intersect vs bedtools)."""
import bionumpy_tpu as bnp
from bionumpy_tpu.arithmetics import unique_intersect


def unique_intersect_files(file_a: str, file_b: str,
                           chrom_sizes_file: str, output_file: str):
    genome = bnp.Genome.from_file(chrom_sizes_file)
    a = bnp.open(file_a).read()
    b = bnp.open(file_b).read()
    go = genome.get_genome_context().global_offset
    global_a = go.from_local_interval(a)
    global_b = go.from_local_interval(b)
    result = unique_intersect(global_a, global_b, genome.size)
    local = go.to_local_interval(result)
    bnp.open(output_file, "w").write(local)


if __name__ == "__main__":
    import sys
    unique_intersect_files(*sys.argv[1:5])
