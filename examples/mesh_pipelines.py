"""The four whole-job mesh pipelines on real example data.

Each call runs file-in to result-out, data-parallel over a
jax.sharding.Mesh (omit mesh= for the same code on one device); the
merges are psum/all_gather collectives over the associative combiner
algebra (docs/parallel.md).  Run with a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python examples/mesh_pipelines.py
"""
import bionumpy_tpu as bnp
from bionumpy_tpu.parallel import create_mesh

EX = "/root/reference/example_data"


def main(n_devices: int = 4):
    mesh = create_mesh(n_devices)

    counts, stats = bnp.count_kmers_fastq(f"{EX}/big.fq.gz", 31,
                                          cap=1 << 18, mesh=mesh)
    print(f"31-mers: {len(counts.counts)} distinct / "
          f"{stats['n_kmers']} total from {stats['n_reads']} reads")

    mins, mstats = bnp.count_minimizers_fastq(f"{EX}/big.fq.gz", 21, 30,
                                              cap=1 << 15, mesh=mesh)
    print(f"minimizers(k=21,w=30): {len(mins.counts)} distinct over "
          f"{mstats['n_windows']} windows")

    from bionumpy_tpu.io.jaspar import read_jaspar_matrix
    pwm = read_jaspar_matrix(f"{EX}/MA0080.1.jaspar")
    rows, offs, pstats = bnp.get_motif_matches_fastq(
        f"{EX}/big.fq.gz", pwm, threshold=6.0, cap=1 << 15, mesh=mesh)
    print(f"MA0080.1 matches: {pstats['n_matches']} across "
          f"{pstats['n_reads']} reads (first: read {int(rows[0])} "
          f"offset {int(offs[0])})")

    chroms = {"chr21": 46709983, "chr22": 50818468}
    tracks, tstats = bnp.binned_pileup_bed(
        f"{EX}/ctcf_chr21-22.bed.gz", chroms, bin_size=1000, mesh=mesh)
    covered = {name: int(t.sum()) for name, t in tracks.items()}
    print(f"binned pileup: {tstats['n_intervals']} peaks -> "
          f"{tstats['n_bins']} bins, covered bases {covered}")


if __name__ == "__main__":
    import os
    import jax
    # force CPU before backend init: this machine's sitecustomize
    # force-sets jax_platforms=axon,cpu, which BEATS the env var
    jax.config.update("jax_platforms", "cpu")
    if "xla_force_host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_num_cpu_devices", 4)
    main(min(4, jax.device_count()))
