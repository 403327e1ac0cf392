"""DNA -> protein translation (reference:
bionumpy/sequence/translate.py:12-78)."""
from __future__ import annotations

import numpy as np

from ..bnpdataclass.bnpdataclassfunction import apply_to_npdataclass
from ..encoded_array import (BaseEncoding, EncodedArray, EncodedRaggedArray,
                             as_encoded_array)
from ..encodings.alphabet_encoding import AlphabetEncoding
from ..ragged import RaggedShape
from ..streams import streamable


class DNAToProtein:
    """Codon table indexed by little-endian base-4 hash of the REVERSED
    codon over the TCAG alphabet."""
    amino_acids = ("FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRR"
                   "IIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG")
    from_encoding = AlphabetEncoding("TCAG")
    to_encoding = BaseEncoding
    lookup_table = np.frombuffer(amino_acids.encode("ascii"), dtype=np.uint8)

    def __getitem__(self, kmer_hash):
        return self.lookup_table[np.asarray(kmer_hash)]


class WindowFunction:
    """Base for fixed-window functions over whole-row-multiple windows
    (reference: bionumpy/sequence/translate.py:23-31)."""

    def windowed(self, sequences):
        return self.__call__(sequences)


class Translate(WindowFunction):
    def __init__(self, table=DNAToProtein()):
        self._table = table
        self._encoding = table.from_encoding

    @property
    def window_size(self) -> int:
        return 3

    def windowed(self, sequences):
        sequences = as_encoded_array(sequences,
                                     target_encoding=self._encoding)
        was_flat = isinstance(sequences, EncodedArray)
        if was_flat:
            sequences = EncodedRaggedArray(sequences, [len(sequences)])
        assert np.all(np.asarray(sequences.lengths) % self.window_size == 0)
        flat = np.asarray(sequences.ravel().raw())
        aminos = self._translate_flat(flat)
        out = EncodedRaggedArray(
            EncodedArray(aminos, self._table.to_encoding),
            RaggedShape(np.asarray(sequences.lengths) // self.window_size))
        if was_flat:
            return out[0]
        return out

    def _translate_flat(self, flat_codes: np.ndarray) -> np.ndarray:
        if flat_codes.size >= (1 << 15):
            import jax.numpy as jnp
            from ..ops.seq import translate_codons
            out = translate_codons(
                jnp.asarray(flat_codes),
                jnp.asarray(self._table.lookup_table))
            return np.asarray(out, dtype=np.uint8)
        codons = flat_codes.reshape(-1, 3).astype(np.int64)
        index = codons[:, 2] + codons[:, 1] * 4 + codons[:, 0] * 16
        return self._table.lookup_table[index]


@streamable()
@apply_to_npdataclass("sequence")
def translate_dna_to_protein(sequence):
    """Translate DNA to protein (codons of 3).

    Examples
    --------
    >>> import bionumpy_tpu as bnp
    >>> bnp.sequence.translate_dna_to_protein(
    ...     bnp.as_encoded_array(["ATGTTTTGA"]))
    encoded_ragged_array(['MF*'])
    """
    return Translate().windowed(sequence)
