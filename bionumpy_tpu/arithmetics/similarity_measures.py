"""Interval-set similarity (reference:
bionumpy/arithmetics/similarity_measures.py)."""
from __future__ import annotations

import numpy as np

from ..streams import MultiStream, streamable
from .intervals import get_boolean_mask


@streamable(sum)
def get_contingency_table(intervals_a, intervals_b, sequence_length):
    boolean_a = get_boolean_mask(intervals_a, sequence_length)
    boolean_b = get_boolean_mask(intervals_b, sequence_length)
    not_a = ~boolean_a
    not_b = ~boolean_b
    return np.array([
        [(boolean_a & boolean_b).sum(), (boolean_a & not_b).sum()],
        [(not_a & boolean_b).sum(), (not_a & not_b).sum()]])


def forbes(chromosome_sizes, intervals_a, intervals_b) -> float:
    """Forbes similarity index for two sorted interval sets.

    Examples
    --------
    >>> from bionumpy_tpu.arithmetics import forbes, sort_intervals
    >>> from bionumpy_tpu.datatypes import Interval
    >>> a = Interval.from_entry_tuples([("chr1", 10, 20), ("chr2", 20, 30)])
    >>> b = Interval.from_entry_tuples([("chr2", 15, 25), ("chr1", 10, 40)])
    >>> a_sorted = sort_intervals(a, sort_order=["chr1", "chr2"])
    >>> b_sorted = sort_intervals(b, sort_order=["chr1", "chr2"])
    >>> forbes({"chr1": 100, "chr2": 200}, a_sorted, b_sorted)
    5.625
    """
    ms = MultiStream(chromosome_sizes, a=intervals_a, b=intervals_b)
    ((a, b), (c, d)) = get_contingency_table(ms.a, ms.b, ms.lengths)
    total = a + b + c + d
    return float(a * total / ((a + b) * (a + c)))


def jaccard(chromosome_sizes, intervals_a, intervals_b) -> float:
    """Jaccard similarity index for two sorted interval sets."""
    ms = MultiStream(chromosome_sizes, a=intervals_a, b=intervals_b)
    ((a, b), (c, d)) = get_contingency_table(ms.a, ms.b, ms.lengths)
    total = a + b + c + d
    return float(a / (total - d))
