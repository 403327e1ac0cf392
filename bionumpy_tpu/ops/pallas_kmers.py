"""Pallas TPU kernel for the rolling-hash hot loop.

The 2-bit pack runs as one cheap XLA pass (16 bases -> one uint32 word);
the kernel consumes three *shifted* word streams (words[i], words[i+1],
words[i+2]) so every grid block is a plain non-overlapping block — halo
handling becomes shifted XLA slices instead of overlapping BlockSpecs.

In-kernel layout is (offset, word): row j holds the hash whose window
starts at bit offset 2j of its word, so the whole window extraction is
one broadcast + iota shift per limb — no reshapes or gathers, which
Mosaic cannot vectorize.  Output is de-interleaved back to position
order by one XLA transpose.

Replaces the reference hot loop (npstructures BitArray.pack +
sliding_window at bionumpy/sequence/kmers.py:106-128).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORD_BASES = 16
# one grid step processes WORDS_PER_BLOCK words = BLOCK positions
WORDS_PER_BLOCK = 1024
BLOCK = WORDS_PER_BLOCK * WORD_BASES  # 16384 positions


def _kmer_block_kernel(w0_ref, w1_ref, w2_ref, dist_ref, lo_ref, hi_ref,
                        valid_ref, *, k: int):
    shape = (WORD_BASES, WORDS_PER_BLOCK)
    p0 = jnp.broadcast_to(w0_ref[0], shape)
    p1 = jnp.broadcast_to(w1_ref[0], shape)
    p2 = jnp.broadcast_to(w2_ref[0], shape)
    bit = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * 2)
    nonzero = bit > 0
    inv = jnp.where(nonzero, 32 - bit, 0).astype(jnp.uint32)
    lo = (p0 >> bit) | jnp.where(nonzero, p1 << inv, 0)
    hi = (p1 >> bit) | jnp.where(nonzero, p2 << inv, 0)
    if k <= 16:
        mask_lo = jnp.uint32(0xFFFFFFFF) if k == 16 else \
            jnp.uint32((1 << (2 * k)) - 1)
        lo = lo & mask_lo
        hi = jnp.zeros(shape, jnp.uint32)
    else:
        mask_hi = jnp.uint32(0xFFFFFFFF) if k == 32 else \
            jnp.uint32((1 << (2 * (k - 16))) - 1)
        hi = hi & mask_hi
    lo_ref[0] = lo
    hi_ref[0] = hi
    valid_ref[0] = dist_ref[0] >= k


def _pack_words(codes: jnp.ndarray) -> jnp.ndarray:
    blocks = codes.astype(jnp.uint32).reshape(-1, WORD_BASES)
    shifts = 2 * jnp.arange(WORD_BASES, dtype=jnp.uint32)
    return (blocks << shifts).sum(axis=-1).astype(jnp.uint32)


def _fullsum_kernel(w0_ref, w1_ref, w2_ref, lo_ref, hi_ref, *, k: int):
    """Fused hash + reduce: one VMEM pass per block, scalar SMEM
    accumulators across the (sequential) grid.  Mosaic cannot reduce
    unsigned ints, so limbs are bitcast to int32 — sums mod 2^32 are
    identical."""
    i = pl.program_id(0)
    shape = (WORD_BASES, WORDS_PER_BLOCK)
    p0 = jnp.broadcast_to(w0_ref[0], shape)
    p1 = jnp.broadcast_to(w1_ref[0], shape)
    p2 = jnp.broadcast_to(w2_ref[0], shape)
    bit = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * 2)
    nonzero = bit > 0
    inv = jnp.where(nonzero, 32 - bit, 0).astype(jnp.uint32)
    lo = (p0 >> bit) | jnp.where(nonzero, p1 << inv, 0)
    hi = (p1 >> bit) | jnp.where(nonzero, p2 << inv, 0)
    if k <= 16:
        mask_lo = jnp.uint32(0xFFFFFFFF) if k == 16 else \
            jnp.uint32((1 << (2 * k)) - 1)
        lo = lo & mask_lo
        hi = jnp.zeros(shape, jnp.uint32)
    else:
        mask_hi = jnp.uint32(0xFFFFFFFF) if k == 32 else \
            jnp.uint32((1 << (2 * (k - 16))) - 1)
        hi = hi & mask_hi
    lo_part = jnp.sum(jax.lax.bitcast_convert_type(lo, jnp.int32))
    hi_part = jnp.sum(jax.lax.bitcast_convert_type(hi, jnp.int32))

    @pl.when(i == 0)
    def _init():
        lo_ref[0, 0] = 0
        hi_ref[0, 0] = 0

    lo_ref[0, 0] += lo_part
    hi_ref[0, 0] += hi_part


@partial(jax.jit, static_argnames=("k",))
def pallas_fullsum_packed(words: jnp.ndarray, k: int):
    """Unmasked (lo_sum, hi_sum) over all window positions from packed
    words — the device half of the hybrid checksum
    (ops/kmers.kmer_fullsum_packed), fused so each word is read once
    from HBM and nothing is materialized."""
    n_words = words.shape[0] - 2
    assert n_words % WORDS_PER_BLOCK == 0, n_words
    n_blocks = n_words // WORDS_PER_BLOCK
    w0 = words[:n_words].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    w1 = words[1: n_words + 1].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    w2 = words[2: n_words + 2].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    word_spec = pl.BlockSpec((1, 1, WORDS_PER_BLOCK),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    lo, hi = pl.pallas_call(
        partial(_fullsum_kernel, k=k),
        grid=(n_blocks,),
        in_specs=[word_spec, word_spec, word_spec],
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.int32)] * 2,
    )(w0, w1, w2)
    return (jax.lax.bitcast_convert_type(lo[0, 0], jnp.uint32),
            jax.lax.bitcast_convert_type(hi[0, 0], jnp.uint32))


@partial(jax.jit, static_argnames=("k",))
def pallas_kmer_hashes(codes_padded: jnp.ndarray, dist_padded: jnp.ndarray,
                       k: int):
    """(lo, hi, valid) for every flat position via the fused kernel.

    codes_padded: uint8, length n_positions + 32 where n_positions is a
    multiple of 16384; dist_padded: int32 (n_positions,)."""
    n_positions = codes_padded.shape[0] - 2 * WORD_BASES
    assert n_positions % BLOCK == 0, n_positions
    n_blocks = n_positions // BLOCK
    words = _pack_words(codes_padded)
    n_words = n_positions // WORD_BASES
    w0 = words[:n_words].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    w1 = words[1: n_words + 1].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    w2 = words[2: n_words + 2].reshape(n_blocks, 1, WORDS_PER_BLOCK)
    # dist de-interleaved to (offset, word) layout
    dist_blocks = dist_padded.reshape(n_blocks, WORDS_PER_BLOCK,
                                      WORD_BASES).transpose(0, 2, 1)

    word_spec = pl.BlockSpec((1, 1, WORDS_PER_BLOCK),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    pos_spec = pl.BlockSpec((1, WORD_BASES, WORDS_PER_BLOCK),
                            lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    pos_shape = (n_blocks, WORD_BASES, WORDS_PER_BLOCK)

    lo, hi, valid = pl.pallas_call(
        partial(_kmer_block_kernel, k=k),
        grid=(n_blocks,),
        in_specs=[word_spec, word_spec, word_spec, pos_spec],
        out_specs=[pos_spec, pos_spec, pos_spec],
        out_shape=[
            jax.ShapeDtypeStruct(pos_shape, jnp.uint32),
            jax.ShapeDtypeStruct(pos_shape, jnp.uint32),
            jax.ShapeDtypeStruct(pos_shape, jnp.bool_),
        ],
    )(w0, w1, w2, dist_blocks)
    # back to position order
    lo = lo.transpose(0, 2, 1).reshape(-1)
    hi = hi.transpose(0, 2, 1).reshape(-1)
    valid = valid.transpose(0, 2, 1).reshape(-1)
    return lo, hi, valid
