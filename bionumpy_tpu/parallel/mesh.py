"""Device mesh construction for data-parallel sequence analytics.

The reference has no distributed runtime (SURVEY §2.10); its chunk-stream
reduction algebra (bincount pad-add, sum_and_n, histogram add) is
associative, so the TPU design shards the chunk axis over a 1-D "dp"
mesh and merges partials with psum over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    return Mesh(np.array(devices[:n_devices]), axis_names=axis_names)
