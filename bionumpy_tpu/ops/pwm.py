"""Device PWM scanning: offset-shifted LUT accumulate
(reference algorithm: bionumpy/sequence/position_weight_matrix.py:85-101).

scores[i] = sum_j matrix[seq[i+j], j] over all flat positions; invalid
(row-crossing) windows are masked by the caller via the distance vector.
The per-offset gather is a take from a (alphabet_size,) column — XLA
lowers small-table takes to vector selects, keeping the whole scan one
fused VPU loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window_size",))
def pwm_scores(codes: jnp.ndarray, matrix: jnp.ndarray, window_size: int):
    """codes: flat int codes (padded with zeros beyond true length + w).
    matrix: (alphabet_size, window_size) float32 log-likelihoods.
    Returns flat scores of the same length as codes."""
    n = codes.shape[0]
    codes = codes.astype(jnp.int32)
    scores = jnp.zeros(n, dtype=jnp.float32)
    for offset in range(window_size):
        column = matrix[:, offset]
        shifted = jnp.concatenate(
            [codes[offset:], jnp.zeros(offset, dtype=jnp.int32)])
        scores = scores + jnp.take(column, shifted)
    return scores


@partial(jax.jit, static_argnames=("window_size",))
def pwm_scores_packed(words: jnp.ndarray, matrix: jnp.ndarray,
                      window_size: int):
    """4-letter-alphabet variant taking 2-bit-packed uint32 words
    (0.25 B/base over the host->device link); codes unpack on device
    with one shift table, then the same offset-shifted LUT accumulate."""
    n = words.shape[0] * 16
    p0 = jnp.repeat(words, 16)
    bit = jnp.tile(jnp.arange(16, dtype=jnp.uint32) * 2,
                   words.shape[0])
    codes = ((p0 >> bit) & 3).astype(jnp.int32)
    scores = jnp.zeros(n, dtype=jnp.float32)
    for offset in range(window_size):
        column = matrix[:, offset]
        shifted = jnp.concatenate(
            [codes[offset:], jnp.zeros(offset, dtype=jnp.int32)])
        scores = scores + jnp.take(column, shifted)
    return scores


@partial(jax.jit, static_argnames=("window_size", "cap"))
def pwm_match_compact(scores: jnp.ndarray, ends: jnp.ndarray, n_true,
                      threshold, window_size: int, cap: int):
    """Compact the flat positions whose window score exceeds `threshold`
    (and whose window stays inside its row) to the front of a cap-sized
    buffer — D2H is then proportional to the MATCHES, not the bases.
    Returns (positions int32 (cap,), n_matches)."""
    n = scores.shape[0]
    marks = jnp.zeros(n + 1, jnp.int32)
    marks = marks.at[jnp.maximum(ends - (window_size - 1), 0)].add(1)
    marks = marks.at[ends].add(-1)
    invalid = jnp.cumsum(marks[:-1]) > 0
    pos = jnp.arange(n, dtype=jnp.int32)
    hit = (scores > threshold) & ~invalid & \
        (pos < jnp.minimum(ends[-1], n_true))
    n_matches = hit.sum()
    _, p2 = jax.lax.sort(((~hit).astype(jnp.uint32), pos), num_keys=1,
                         is_stable=True)
    return p2[:cap], n_matches


@partial(jax.jit, static_argnames=("window_size",))
def pwm_best_scores(codes: jnp.ndarray, dist: jnp.ndarray,
                    matrix: jnp.ndarray, window_size: int):
    """(max_score, count_above) helpers for motif matching; invalid
    windows get -inf."""
    scores = pwm_scores(codes, matrix, window_size)
    valid = dist[: scores.shape[0]] >= window_size
    masked = jnp.where(valid, scores, -jnp.inf)
    return masked
