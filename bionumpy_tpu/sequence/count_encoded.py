"""Label-space counting (reference: bionumpy/sequence/count_encoded.py).

The axis=-1 per-row count avoids the reference's per-row Python
bincount loop (count_encoded.py:176) by one flat bincount over
row_index * n_labels + value.
"""
from __future__ import annotations

from numbers import Number
from typing import Dict, List, Optional

import numpy as np

from ..encoded_array import EncodedArray, EncodedRaggedArray
from ..io.matrix_dump import Matrix
from ..ragged import RaggedArray


class EncodedCounts:
    def __init__(self, alphabet, counts, row_names=None):
        self.alphabet = alphabet
        self.counts = counts
        self.row_names = row_names

    def __str__(self):
        return "\n".join(f"{c}: {n}"
                         for c, n in zip(self.alphabet, self.counts.T))

    def __repr__(self):
        return (f"EncodedCounts(alphabet={self.alphabet!r}, "
                f"counts={self.counts!r}, row_names={self.row_names!r})")

    def __eq__(self, other):
        if self.alphabet != other.alphabet:
            return False
        return bool(np.all(self.counts == other.counts))

    def __getitem__(self, idx: str):
        return self.counts[..., self.alphabet.index(idx)]

    def _other_counts(self, other):
        if isinstance(other, Number):
            return other
        assert self.alphabet == other.alphabet
        return other.counts

    def __add__(self, other):
        return self.__class__(self.alphabet,
                              self.counts + self._other_counts(other))

    __radd__ = __add__

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__":
            return NotImplemented
        arrays = [i.counts if isinstance(i, EncodedCounts) else i
                  for i in inputs]
        kwargs = {k: i.counts if isinstance(i, EncodedCounts) else i
                  for k, i in kwargs.items()}
        return self.__class__(self.alphabet, ufunc(*arrays, **kwargs))

    @property
    def proportions(self) -> np.ndarray:
        s = self.counts.sum(axis=-1, keepdims=True)
        return np.where(s > 0, self.counts / s, 0)

    @property
    def proportion_matrix(self) -> Matrix:
        return Matrix(self.proportions, col_names=self.alphabet)

    def get_count_for_label(self, label: str) -> int:
        return sum(np.sum(self.counts[..., self.alphabet.index(c)])
                   for c in label)

    @property
    def labels(self) -> List[str]:
        return self.alphabet

    @classmethod
    def vstack(cls, counts):
        alphabet = counts[0].alphabet
        assert all(c.alphabet == alphabet for c in counts)
        ret = cls(alphabet,
                  np.array([c.counts for c in counts], dtype="int"))
        if counts[0].row_names is not None:
            ret.row_names = [c.row_names for c in counts]
        return ret

    def most_common(self, n: Optional[int] = None) -> "EncodedCounts":
        args = np.argsort(self.counts)[::-1]
        if n is not None:
            args = args[:n]
        return self.__class__([self.alphabet[i] for i in args],
                              self.counts[args])

    def as_dict(self) -> Dict[str, np.ndarray]:
        return dict(zip(self.alphabet, self.counts.T))


def count_encoded(values, weights=None, axis: int = -1) -> EncodedCounts:
    """Count occurrences of encoded labels (reference semantics:
    bionumpy/sequence/count_encoded.py:150-188).

    Examples
    --------
    >>> import bionumpy_tpu as bnp
    >>> bnp.count_encoded(bnp.as_encoded_array(["ACGG"], bnp.DNAEncoding))
    EncodedCounts(alphabet=['A', 'C', 'G', 'T'], counts=array([[1, 1, 2, 0]]), row_names=None)
    """
    weights2d = weights is not None and np.asarray(weights).ndim == 2
    if axis is None:
        values = values.ravel()
    encoding = values.encoding
    if hasattr(encoding, "get_alphabet"):
        alphabet = encoding.get_alphabet()
    else:
        alphabet = encoding.get_labels()
    n_labels = len(alphabet)
    if isinstance(values, EncodedArray) and values.ndim == 1 and not weights2d:
        counts = np.bincount(values.raw(), weights=weights,
                             minlength=n_labels)
        if weights is None:
            counts = counts.astype(np.int64)
    elif axis == -1:
        if isinstance(values, EncodedRaggedArray) and not weights2d:
            # one flat bincount over row*n_labels+value
            flat = np.asarray(values.ravel().raw()).astype(np.int64)
            rows = np.repeat(np.arange(len(values)), values.lengths)
            combined = rows * n_labels + flat
            w = None if weights is None else np.asarray(
                weights.ravel() if isinstance(weights, RaggedArray)
                else weights)
            counts = np.bincount(combined, weights=w,
                                 minlength=len(values) * n_labels
                                 ).reshape(len(values), n_labels)
            if weights is None:
                counts = counts.astype(np.int64)
        elif weights2d:
            counts = np.array(
                [np.bincount(values.raw(), weights=row, minlength=n_labels)
                 for row in np.asarray(weights)])
            if not np.issubdtype(np.asarray(weights).dtype, np.floating):
                counts = counts.astype(int)
        else:
            counts = np.array(
                [np.bincount(np.asarray(row.raw() if hasattr(row, "raw")
                                        else row), weights=weights,
                             minlength=n_labels)
                 for row in values])
    else:
        raise ValueError(f"unsupported axis {axis}")
    return EncodedCounts(alphabet, counts)
