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
                        DNAEncoding, QualityEncoding, RNAEncoding,
                        RNAENcoding, StrandEncoding)
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
    "StrandEncoding", "KmerEncoding", "StringEncoding", "RNAEncoding",
    "RNAENcoding",
    "RaggedArray", "RaggedShape", "RaggedView", "ragged_slice",
    "StringArray", "string_array", "as_string_array",
]


from .io import (Bed6Buffer, BedBuffer, FastQBuffer, GFFBuffer,
                 GfaSequenceBuffer, MultiLineFastaBuffer, NarrowPeakBuffer,
                 SAMBuffer, TwoLineFastaBuffer, bnp_open, count_entries,
                 get_bufferclass_for_datatype, open_indexed, read)
from .sequence import (EncodedCounts, count_encoded, count_kmers, get_kmers,
                       get_minimizers, get_motif_scores,
                       get_reverse_complement, match_string,
                       translate_dna_to_protein)
from .sequence.kmers import KmerEncoder
from .sequence.minimizers import Minimizers
from .sequence.position_weight_matrix import PWM, PositionWeightMatrix
from .streams import (MultiStream, bincount, groupby, histogram, mean,
                      quantile, streamable)
from .datatypes import (BamEntry, Bed6, GFFEntry, Interval, LocationEntry,
                        SAMEntry, SequenceEntry, SequenceEntryWithQuality,
                        VCFEntry)
from . import datatypes
from .bnpdataclass import replace
from .io.strops import str_equal
from .computation_graph import compute
from . import arithmetics
from . import alignments
from . import variants
from . import simulate
from .genomic_data import Genome, GenomicArray, GenomicIntervals
from .io.matrix_dump import Matrix
from .cli import CliWrapper, run_as_commandline
from .plotting import plot
from .pipeline import (binned_pileup_bed, count_kmers_fastq,
                       count_minimizers_fastq, get_motif_matches_fastq)

open = bnp_open

# the reference exposes npstructures as `bnp.nps`; this build's ragged
# package is the from-scratch replacement for that substrate
# (reference: bionumpy/__init__.py imports npstructures as nps)
from . import ragged as nps  # noqa: E402


def set_backend(lib):
    """The reference swaps numpy for cupy via module monkey-patching
    (bionumpy/__init__.py:47-95).  This build is JAX/TPU-native from the
    ground up — there is no backend to swap."""
    raise NotImplementedError(
        "bionumpy_tpu is JAX/TPU-native; compute already runs on the "
        "accelerator and there is no numpy/cupy backend to swap. "
        "Control device selection with JAX_PLATFORMS instead.")

__all__ += [
    "open", "bnp_open", "read", "count_entries", "open_indexed",
    "get_kmers", "count_kmers", "get_minimizers", "get_motif_scores",
    "get_reverse_complement", "translate_dna_to_protein", "count_encoded",
    "match_string", "EncodedCounts", "PWM", "MultiStream", "groupby",
    "streamable", "mean", "bincount", "histogram", "quantile", "replace",
    "str_equal", "compute", "Genome", "GenomicArray", "GenomicIntervals",
    "Matrix", "plot", "Interval", "SequenceEntry",
    "SequenceEntryWithQuality", "VCFEntry", "BamEntry", "SAMEntry",
    "Bed6", "GFFEntry", "LocationEntry", "arithmetics", "alignments",
    "variants", "simulate", "CliWrapper", "run_as_commandline",
    "get_bufferclass_for_datatype", "TwoLineFastaBuffer", "FastQBuffer",
    "count_kmers_fastq", "count_minimizers_fastq",
    "get_motif_matches_fastq", "binned_pileup_bed",
    "MultiLineFastaBuffer", "BedBuffer", "Bed6Buffer", "NarrowPeakBuffer",
    "GfaSequenceBuffer", "GFFBuffer", "SAMBuffer", "KmerEncoder",
    "Minimizers", "PositionWeightMatrix",
]
