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

_DEFAULT_MESH: Optional[Mesh] = None


def set_default_mesh(mesh: Optional[Mesh]) -> None:
    """Install a mesh that ``page_rank``/``wcc``/``delta_stepping``
    route through automatically (round-2: the sharded engines used to
    require hand-assembly of shard_graph + *_sharded)."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh() -> Optional[Mesh]:
    return _DEFAULT_MESH


def mesh_key(mesh: Mesh) -> tuple:
    """Stable identity for per-graph cache keys.

    ``id(mesh)`` can be reused by a new Mesh after the old one is
    garbage-collected while the graph (and its cache entry) lives on —
    the same id-reuse hazard ``engine_for`` guards against for graphs.
    Axis names + device ids are stable for the lifetime of the process.
    """
    return (tuple(mesh.axis_names), mesh.devices.shape,
            tuple(int(d.id) for d in mesh.devices.flat))


class use_mesh:
    """Context manager: route algorithms through ``mesh`` inside."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self._prev = None

    def __enter__(self):
        self._prev = _DEFAULT_MESH
        set_default_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_default_mesh(self._prev)
        return False


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
