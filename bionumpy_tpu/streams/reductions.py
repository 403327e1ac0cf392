"""Associative stream reductions (reference:
bionumpy/streams/reductions.py).

These combiners (pad-and-add bincount, histogram add, sum-and-count mean)
are the exact algebra merged with psum across devices in
bionumpy_tpu/parallel/.
"""
from __future__ import annotations

from functools import reduce

import numpy as np

from .decorators import streamable


def bincount_reduce(bincount_a, bincount_b):
    if bincount_a.size >= bincount_b.size:
        bincount_a[: bincount_b.size] += bincount_b
        return bincount_a
    bincount_b[: bincount_a.size] += bincount_a
    return bincount_b


bincount = streamable(lambda x: reduce(bincount_reduce, x))(np.bincount)


def histogram_reduce(histograms):
    hist, edges = next(histograms)
    hist = sum(h[0] for h in histograms) + hist
    return hist, edges


histogram = streamable(histogram_reduce)(np.histogram)


@streamable(sum)
def sum_and_n(array, axis=None):
    if axis is None:
        n = array.size
    elif axis == 0:
        n = len(array)
    return np.append(np.sum(array, axis=axis), n)


@streamable()
def _rowmean(array, axis=None):
    return np.mean(array, axis=axis)


def mean(array, axis=None):
    """Streaming mean via the associative (sum, n) fold."""
    if axis is not None and axis != 0:
        return _rowmean(array, axis)
    t = sum_and_n(array, axis=axis)
    return t[:-1] / t[-1] if t.ndim else t


def quantile(array, quantiles, axis=None):
    """Quantiles of non-negative ints via cumulative bincount."""
    hist = bincount(array)
    cumulative = np.cumsum(hist)
    return np.searchsorted(cumulative, np.asarray(quantiles) * cumulative[-1])
