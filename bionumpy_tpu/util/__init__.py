"""Utility helpers (reference: bionumpy/util/__init__.py)."""
from __future__ import annotations

import functools
import inspect

import numpy as np


def is_subclass_or_instance(obj, cls) -> bool:
    return (inspect.isclass(obj) and issubclass(obj, cls)) or \
        isinstance(obj, cls)


cached_property = functools.cached_property


def interleave(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.empty(len(a) + len(b), dtype=a.dtype)
    out[0::2] = a
    out[1::2] = b
    return out
