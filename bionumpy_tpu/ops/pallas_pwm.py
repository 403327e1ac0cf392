"""Pallas TPU kernel for PWM sliding-window scoring.

The gather-free formulation the north star asks for: the kernel consumes
the same three shifted 2-bit-packed word streams as the k-mer kernel
(one HBM read per word), reconstructs the 32-base window limbs once, and
accumulates the motif score with STATIC shifts per offset — code at
window offset j is ((limb >> 2j) & 3), so each offset is two shifts, one
mask and three vector selects against the matrix column scalars held in
SMEM.  No gathers, no reshapes across tiled dims (Mosaic-safe), -inf
matrix cells flow through the f32 selects exactly.

Replaces the reference's per-offset fancy-gather loop
(reference: bionumpy/sequence/position_weight_matrix.py:85-101).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORD_BASES = 16
WORDS_PER_BLOCK = 1024
BLOCK = WORDS_PER_BLOCK * WORD_BASES

MAX_WINDOW = 32  # window spans at most 3 consecutive words


def _pwm_block_kernel(w0_ref, w1_ref, w2_ref, mat_ref, out_ref, *,
                      window: int):
    shape = (WORD_BASES, WORDS_PER_BLOCK)
    p0 = jnp.broadcast_to(w0_ref[0], shape)
    p1 = jnp.broadcast_to(w1_ref[0], shape)
    p2 = jnp.broadcast_to(w2_ref[0], shape)
    bit = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * 2
    nonzero = bit > 0
    inv = jnp.where(nonzero, 32 - bit, 0).astype(jnp.uint32)
    lo = (p0 >> bit) | jnp.where(nonzero, p1 << inv, 0)
    hi = (p1 >> bit) | jnp.where(nonzero, p2 << inv, 0)
    acc = jnp.zeros(shape, jnp.float32)
    three = jnp.uint32(3)
    for j in range(window):
        if j < WORD_BASES:
            code = (lo >> jnp.uint32(2 * j)) & three
        else:
            code = (hi >> jnp.uint32(2 * (j - WORD_BASES))) & three
        m0 = mat_ref[0, j]
        m1 = mat_ref[1, j]
        m2 = mat_ref[2, j]
        m3 = mat_ref[3, j]
        acc += jnp.where(code == 0, m0,
                         jnp.where(code == 1, m1,
                                   jnp.where(code == 2, m2, m3)))
    out_ref[0] = acc


@partial(jax.jit, static_argnames=("window",))
def pallas_pwm_scores_packed(words: jnp.ndarray, matrix: jnp.ndarray,
                             window: int) -> jnp.ndarray:
    """Scores at every flat window position from packed words.

    words: uint32, (n_positions/16 + 2,) with n_positions a multiple of
    16384 (the standard device bucket).  matrix: (4, window) float32.
    Returns float32 scores in position order; windows that run into
    padding or the next row score over those codes and must be trimmed
    by the caller (the reference's own garbage-at-row-ends strategy,
    bionumpy/sequence/rollable.py:57-69)."""
    assert window <= MAX_WINDOW, window
    n_words = words.shape[0] - 2
    assert n_words % WORDS_PER_BLOCK == 0, n_words
    n_blocks = n_words // WORDS_PER_BLOCK
    w0 = words[:n_words].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    w1 = words[1: n_words + 1].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    w2 = words[2: n_words + 2].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    word_spec = pl.BlockSpec((1, 1, WORDS_PER_BLOCK),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((4, window), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    pos_spec = pl.BlockSpec((1, WORD_BASES, WORDS_PER_BLOCK),
                            lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_pwm_block_kernel, window=window),
        grid=(n_blocks,),
        in_specs=[word_spec, word_spec, word_spec, mat_spec],
        out_specs=pos_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, WORD_BASES, WORDS_PER_BLOCK), jnp.float32),
    )(w0, w1, w2, matrix.astype(jnp.float32))
    # de-interleave (offset, word) layout back to position order
    return out.transpose(0, 2, 1).reshape(-1)


def pwm_scores_packed_auto(words, matrix, window: int):
    """Route to the fused Pallas kernel on TPU when the bucket tiles the
    grid evenly; XLA offset-accumulate otherwise."""
    from .kmers import _words_on_tpu
    from .pwm import pwm_scores_packed
    n_words = int(words.shape[0]) - 2
    if (window <= MAX_WINDOW and n_words % WORDS_PER_BLOCK == 0
            and matrix.shape[0] == 4 and _words_on_tpu(words)):
        return pallas_pwm_scores_packed(
            words, jnp.asarray(np.asarray(matrix), dtype=jnp.float32),
            window)
    return pwm_scores_packed(
        words, jnp.asarray(np.asarray(matrix), dtype=jnp.float32), window)
