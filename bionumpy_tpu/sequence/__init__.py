from .count_encoded import (EncodedCounts, SparseEncodedCounts,
                            count_encoded)
from .dna import (get_reverse_complement, get_sequences,
                  get_strand_specific_sequences)
from .kmers import KmerEncoder, count_kmers, get_kmers
from .minimizers import (Minimizers, count_minimizers,
                         count_minimizers_with_gc, get_minimizers)
from .position_weight_matrix import (PWM, PositionWeightMatrix,
                                     get_motif_matches,
                                     get_motif_scores)
from .string_matcher import match_string
from .translate import translate_dna_to_protein
from .genes import get_transcript_sequences

__all__ = ["get_kmers", "count_kmers", "get_minimizers", "count_minimizers", "count_minimizers_with_gc",
           "translate_dna_to_protein", "get_motif_scores",
           "get_motif_matches", "PWM",
           "get_reverse_complement", "get_strand_specific_sequences",
           "get_sequences", "count_encoded", "match_string",
           "EncodedCounts", "KmerEncoder", "Minimizers",
           "get_transcript_sequences"]


def set_backend(lib):
    """Backend swap is N/A: this build is JAX/TPU-native (the reference
    monkey-patches numpy->cupy here, bionumpy/__init__.py:47-95)."""
    raise NotImplementedError(
        "bionumpy_tpu has no numpy/cupy backend swap; compute is "
        "JAX-native")
