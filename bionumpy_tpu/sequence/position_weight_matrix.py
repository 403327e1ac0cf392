"""PWM / motif scanning — device offset-accumulate scan
(reference: bionumpy/sequence/position_weight_matrix.py)."""
from __future__ import annotations

import typing
from typing import Dict

import numpy as np

from ..encoded_array import (EncodedArray, EncodedRaggedArray,
                             as_encoded_array)
from ..encodings.alphabet_encoding import AlphabetEncoding
from ..ragged import RaggedArray, RaggedShape
from .rollable import RollableFunction


def _pwm_from_counts(count_matrix):
    with_pseudo = count_matrix + 1
    return np.log(with_pseudo / with_pseudo.sum(axis=0, keepdims=True))


class PWM:
    """Position Weight Matrix of log-likelihood ratios
    (reference: bionumpy/sequence/position_weight_matrix.py:35-140)."""

    def __init__(self, matrix, alphabet):
        self._matrix = np.asarray(matrix, dtype=float)
        self._alphabet = alphabet
        self._encoding = AlphabetEncoding(alphabet)
        self._indices = np.arange(self.window_size)

    @property
    def alphabet(self) -> str:
        return self._alphabet

    @property
    def matrix(self) -> np.ndarray:
        return self._matrix

    @property
    def window_size(self) -> int:
        return self._matrix.shape[-1]

    def as_valid_encoded_array(self, sequence):
        if isinstance(sequence, (EncodedArray, EncodedRaggedArray)):
            if isinstance(sequence.encoding, AlphabetEncoding):
                alphabet = list(sequence.encoding.get_alphabet())
                own = list(self._alphabet)
                raw = sequence.raw()
                flat = raw.ravel() if isinstance(raw, RaggedArray) else raw
                max_code = int(np.max(np.asarray(flat), initial=0))
                if alphabet[: len(own)] != own or max_code >= len(own):
                    raise ValueError(
                        f"Cannot calculate pwm for alphabet {own} on "
                        f"{alphabet}-encoded array")
                return sequence
        return as_encoded_array(sequence, self._encoding)

    def calculate_score(self, sequence):
        sequence = self.as_valid_encoded_array(sequence)
        assert sequence.shape[-1] == self.window_size
        scores = self._matrix[sequence.raw(), self._indices]
        return scores.sum(axis=-1)

    def calculate_scores(self, sequence) -> np.ndarray:
        """Scores at every flat position (windows running off the end get
        partial sums, exactly like the reference:
        position_weight_matrix.py:85-101)."""
        sequence = self.as_valid_encoded_array(sequence)
        codes = np.asarray(sequence.raw())
        scores = np.zeros(codes.size, dtype=float)
        matrix_t = self._matrix.T
        for offset, row in enumerate(matrix_t):
            scores[: scores.size - offset] += row[codes[offset:]]
        return scores

    @classmethod
    def from_dict(cls, dictionary: Dict[str, typing.Any],
                  background: Dict[str, float] = None) -> "PWM":
        if background is None:
            background = {key: 1 / len(dictionary) for key in dictionary}
        alphabet = "".join(dictionary.keys())
        with np.errstate(divide="ignore"):
            matrix = np.log(np.array(list(dictionary.values()))) - \
                np.log([background[key] for key in dictionary])[:, np.newaxis]
        return cls(matrix, alphabet)

    @classmethod
    def from_counts(cls, counts: Dict[str, typing.List[int]]) -> "PWM":
        return cls(_pwm_from_counts(np.array(list(counts.values()))),
                   "".join(counts.keys()))

    def __str__(self):
        matrix = self._matrix.transpose()
        return ("PWM with alphabet " + self._alphabet + "\n" +
                "\n".join(" ".join(str(round(c, 2)) for c in row)
                          for row in matrix))


class PositionWeightMatrix(RollableFunction):
    def __init__(self, pwm: PWM):
        self._pwm = pwm
        self._encoding = pwm._encoding
        self.window_size = pwm.window_size

    def __call__(self, sequence):
        return self._pwm.calculate_score(sequence)


def _device_motif_scores(sequence: EncodedRaggedArray,
                         pwm: PWM) -> np.ndarray:
    import jax.numpy as jnp
    from ..ops.device import bucket_size
    from ..ops.pwm import pwm_scores

    if pwm.matrix.shape[0] <= 4 and \
            getattr(sequence.encoding, "alphabet_size", 0) == 4:
        # DNA-class alphabet: reuse the cached 2-bit-packed device words
        # (one H2D per chunk shared with the kmer/minimizer kernels);
        # routes to the fused Pallas kernel on TPU
        from ..ops.pallas_pwm import pwm_scores_packed_auto
        from ..ops.resident import device_seqs
        ds = device_seqs(sequence)
        scores = pwm_scores_packed_auto(ds.words, pwm.matrix,
                                        pwm.window_size)
        return np.asarray(scores[:ds.n], dtype=float)
    flat = np.asarray(sequence.ravel().raw())
    n = len(flat)
    size = bucket_size(n + pwm.window_size, 1 << 14)
    codes = np.zeros(size, dtype=np.uint8)
    codes[:n] = flat
    scores = pwm_scores(jnp.asarray(codes),
                        jnp.asarray(pwm.matrix, dtype=jnp.float32),
                        pwm.window_size)
    return np.asarray(scores[:n], dtype=float)


def get_motif_matches(sequence, pwm: PWM, threshold: float,
                      cap: int = 1 << 20) -> RaggedArray:
    """Within-row positions whose motif score exceeds `threshold` — the
    TPU-native motif scan: scores never leave the device; the match
    positions are compacted on device so D2H traffic is proportional to
    the MATCHES (get_motif_scores materializes every window's score,
    reference: bionumpy/sequence/position_weight_matrix.py:166-196,
    which is transport-bound at genome scale).

    Examples
    --------
    >>> import numpy as np
    >>> import bionumpy_tpu as bnp
    >>> from bionumpy_tpu.sequence import PWM, get_motif_matches
    >>> pwm = PWM.from_dict({"A": [0.8, 0.1], "C": [0.1, 0.8],
    ...                      "G": [0.05, 0.05], "T": [0.05, 0.05]})
    >>> m = get_motif_matches(
    ...     bnp.as_encoded_array(["TTACTT", "ACAC"], bnp.DNAEncoding),
    ...     pwm, threshold=1.0)
    >>> [[int(x) for x in np.asarray(row)] for row in m]
    [[2], [0, 2]]
    """
    import jax.numpy as jnp
    from ..ops.pallas_pwm import pwm_scores_packed_auto
    from ..ops.pwm import pwm_match_compact
    from ..ops.resident import device_seqs
    from ..ragged import RaggedArray as _RA

    sequence = as_encoded_array(sequence)
    sequence = pwm.as_valid_encoded_array(sequence)
    if isinstance(sequence, EncodedArray):
        sequence = EncodedRaggedArray(sequence, [len(sequence)])
    assert pwm.matrix.shape[0] == 4 and \
        getattr(sequence.encoding, "alphabet_size", 0) == 4, \
        "device motif matching needs a 4-letter alphabet"
    ds = device_seqs(sequence)
    scores = pwm_scores_packed_auto(ds.words, pwm.matrix, pwm.window_size)
    while True:
        positions, n_matches = pwm_match_compact(
            scores[: ds.n_positions], ds.ends, ds.n,
            jnp.float32(threshold), pwm.window_size,
            min(cap, ds.n_positions))
        n = int(np.asarray(n_matches))
        if n <= cap or cap >= ds.n_positions:
            break
        cap *= 2
    flat = np.asarray(positions[: min(cap, ds.n_positions)])[:n]
    starts = np.insert(np.cumsum(ds.lengths), 0, 0)
    row = np.searchsorted(starts, flat, side="right") - 1
    within = flat - starts[row]
    lengths = np.bincount(row, minlength=len(ds.lengths))
    return _RA(within.astype(np.int64), lengths)


def get_motif_scores(sequence, pwm: PWM) -> RaggedArray:
    """Log-likelihood motif score at every position of every sequence
    (reference: bionumpy/sequence/position_weight_matrix.py:166-196).

    Examples
    --------
    >>> import numpy as np
    >>> import bionumpy_tpu as bnp
    >>> from bionumpy_tpu.sequence import PWM, get_motif_scores
    >>> pwm = PWM.from_dict({"A": [0.4, 0.25], "C": [0.2, 0.25],
    ...                      "G": [0.2, 0.25], "T": [0.2, 0.25]})
    >>> scores = get_motif_scores(
    ...     bnp.as_encoded_array(["ACGT"], bnp.DNAEncoding), pwm)
    >>> np.round(np.asarray(scores.ravel()), 3)
    array([ 0.47 , -0.223, -0.223])

    Windows that run past a sequence end score -inf in the reference's
    example (log(0) terms); here they are gathered off before return, so
    each row has length L - w + 1 ... matching the reference after its
    trim [..., :-w+1]."""
    sequence = as_encoded_array(sequence)
    sequence = pwm.as_valid_encoded_array(sequence)
    is_ragged = isinstance(sequence, EncodedRaggedArray)
    if not is_ragged:
        scores = pwm.calculate_scores(sequence)
        if pwm.window_size == 1:
            return scores
        return scores[: -pwm.window_size + 1]
    # -inf log-likelihood cells (zero-probability positions) flow through
    # the device selects exactly: -inf + finite = -inf, no NaN paths —
    # pinned by tests/test_pwm_device.py
    use_device = sequence.size > (1 << 15)
    if use_device:
        scores = _device_motif_scores(sequence, pwm)
    else:
        scores = pwm.calculate_scores(sequence.ravel())
    ragged = RaggedArray(scores, RaggedShape(sequence.lengths))
    if pwm.window_size == 1:
        return ragged
    return ragged[:, : -pwm.window_size + 1]
