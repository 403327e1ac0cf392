"""Device element-wise sequence ops: LUT encode/decode, complement,
translation, composition counting.

These are the jit twins of the host LUT gathers in
bionumpy_tpu/encodings — same 256-entry tables, expressed as jnp.take.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_symbols",))
def composition_counts(codes: jnp.ndarray, valid: jnp.ndarray,
                       n_symbols: int):
    """Per-symbol counts of a flat code buffer (GC content etc.)."""
    indices = jnp.where(valid, codes.astype(jnp.int32), n_symbols)
    counts = jnp.zeros(n_symbols + 1, dtype=jnp.int32).at[indices].add(1)
    return counts[:-1]


@jax.jit
def composition_from_packed(words: jnp.ndarray, n_true) -> jnp.ndarray:
    """ACGT composition counts straight from 2-bit-packed words: unpack
    (repeat + shift) and four masked reductions — no scatters, one HBM
    pass (the device half of bench config 1; host twin is np.bincount).
    """
    n_positions = (words.shape[0] - 2) * 16
    p0 = jnp.repeat(words[:-2], 16)
    bit = jnp.tile(jnp.arange(16, dtype=jnp.uint32) * 2,
                   words.shape[0] - 2)
    codes = (p0 >> bit) & 3
    valid = jnp.arange(n_positions) < n_true
    return jnp.stack([jnp.sum((codes == c) & valid, dtype=jnp.int32)
                      for c in range(4)])


@jax.jit
def lut_gather(table: jnp.ndarray, codes: jnp.ndarray):
    """table[codes] — encode/decode/complement on device."""
    return jnp.take(table, codes.astype(jnp.int32))


@jax.jit
def encode_with_validation(table: jnp.ndarray, bytes_: jnp.ndarray):
    """(codes, first_invalid_offset_or_minus1). table maps byte->code with
    255 = invalid."""
    codes = jnp.take(table, bytes_.astype(jnp.int32))
    invalid = codes == 255
    any_invalid = invalid.any()
    first = jnp.argmax(invalid)
    return codes, jnp.where(any_invalid, first, -1)


@jax.jit
def translate_codons(codes: jnp.ndarray, amino_table: jnp.ndarray):
    """Flat TCAG codes with length divisible by 3 -> amino acid bytes.

    Mirrors the reference's reversed-codon kmer hash indexing
    (bionumpy/sequence/translate.py:12-78)."""
    codons = codes.reshape(-1, 3).astype(jnp.int32)
    # reference reverses the codon before the little-endian hash:
    # index = c2*1 + c1*4 + c0*16
    index = codons[:, 2] + codons[:, 1] * 4 + codons[:, 0] * 16
    return jnp.take(amino_table, index)
