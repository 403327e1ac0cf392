"""bionumpy_tpu: TPU-native sequence-analytics engine.

A from-scratch re-design of the capabilities of BioNumPy
(/root/reference, bionumpy v1.0.14) for TPU hardware:

- Host layer (numpy): byte-level format parsing, ragged substrate, record
  model — feeds flat uint8 buffers + offsets to the device.
- Device layer (JAX/XLA/Pallas): all hot compute — k-mer rolling hash,
  minimizers, PWM scanning, reverse-complement, translation, counting —
  as jit-compiled kernels over bucket-padded static shapes
  (see bionumpy_tpu/ops/).
- Parallel layer: data-parallel sharding over a jax Mesh with psum/
  all_gather merges of associative combiner state (see
  bionumpy_tpu/parallel/).
"""
__version__ = "0.1.0"

from .encoded_array import (BaseEncoding, EncodedArray, EncodedRaggedArray,
                            Encoding, EncodedLookup, OneToOneEncoding,
                            as_encoded_array, change_encoding,
                            from_encoded_array)
from .encodings import (AminoAcidEncoding, BamEncoding, CigarEncoding,
                        DNAEncoding, QualityEncoding, StrandEncoding)
from .encodings.alphabet_encoding import AlphabetEncoding
from .encodings.kmer_encodings import KmerEncoding
from .encodings.string_encodings import StringEncoding
from .ragged import RaggedArray, RaggedShape, RaggedView, ragged_slice
from .string_array import StringArray, as_string_array, string_array

__all__ = [
    "EncodedArray", "EncodedRaggedArray", "Encoding", "OneToOneEncoding",
    "BaseEncoding", "as_encoded_array", "change_encoding",
    "from_encoded_array", "EncodedLookup", "AlphabetEncoding", "DNAEncoding",
    "AminoAcidEncoding", "BamEncoding", "QualityEncoding", "CigarEncoding",
    "StrandEncoding", "KmerEncoding", "StringEncoding",
    "RaggedArray", "RaggedShape", "RaggedView", "ragged_slice",
    "StringArray", "string_array", "as_string_array",
]


def _late_imports():
    """Populate the full user API; called at the end of module import once
    the io/sequence layers exist (mirrors bionumpy/__init__.py:9-35)."""
    global open, bnp_open, read, count_entries, open_indexed
    global get_kmers, count_kmers, get_minimizers, get_reverse_complement
    global get_motif_scores, translate_dna_to_protein, count_encoded
    global EncodedCounts, PWM, match_string, MultiStream, groupby
    global Genome, compute, streamable, mean, bincount, histogram, quantile
    from .io import bnp_open, count_entries, open_indexed, read
    open = bnp_open
    from .sequence import (count_encoded, count_kmers, get_kmers,
                           get_minimizers, get_motif_scores,
                           get_reverse_complement, match_string,
                           translate_dna_to_protein)
    from .sequence.count_encoded import EncodedCounts
    from .sequence.position_weight_matrix import PWM
    from .streams import (MultiStream, groupby, streamable, mean, bincount,
                          histogram, quantile)
    from .computation_graph import compute
    from .genomic_data import Genome


try:
    _late_imports()
except ImportError:
    # during bootstrap some layers may not exist yet
    pass
