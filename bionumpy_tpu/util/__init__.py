"""Utility helpers (reference: bionumpy/util/__init__.py)."""
from __future__ import annotations

import functools
import inspect

import numpy as np


def is_subclass_or_instance(obj, cls) -> bool:
    return (inspect.isclass(obj) and issubclass(obj, cls)) or \
        isinstance(obj, cls)


cached_property = functools.cached_property


def as_strided(arr, shape=None, strides=None, **kwargs):
    """Strided view helper (reference: bionumpy/util/__init__.py)."""
    if hasattr(arr, "as_strided"):
        return arr.as_strided(shape=shape, strides=strides, **kwargs)
    return np.lib.stride_tricks.as_strided(arr, shape=shape,
                                           strides=strides, **kwargs)


def interleave(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.empty(len(a) + len(b), dtype=a.dtype)
    out[0::2] = a
    out[1::2] = b
    return out
