"""Device-mesh helpers.

The reference has **no** distributed layer — its parallelism is rayon
threads + atomics in one address space (SURVEY.md §2 "parallelism
strategies").  The TPU-native analog of its shared-memory data
parallelism is a 1-D device mesh with the CSR row-block partitioned
across chips and XLA collectives (all_gather / psum / pmin) in place of
cache-coherent atomics.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


NODES_AXIS = "nodes"


def make_mesh(n_devices: Optional[int] = None, axis: str = NODES_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis,))
