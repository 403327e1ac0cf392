from .mesh import create_mesh, device_count
from .kmer_parallel import (parallel_count_kmers, parallel_composition,
                            sharded_pipeline_step)

__all__ = ["create_mesh", "device_count", "parallel_count_kmers",
           "parallel_composition", "sharded_pipeline_step"]
