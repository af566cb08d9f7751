"""CSR graph containers as pytrees of device arrays.

Reference analog: ``Csr`` / ``DirectedCsrGraph`` / ``UndirectedCsrGraph``
(crates/builder/src/graph/csr.rs:58-61,364-368,658-690) and the ``Target``
edge cell (crates/builder/src/graph/mod.rs:5-36).

Design differences (TPU-first, not a translation):

* ``Target<NI, EV>`` (an array-of-structs) becomes structure-of-arrays:
  parallel ``targets`` / ``values`` device arrays.
* In addition to ``offsets`` we store ``sources`` — the row id of every
  edge, ascending (i.e. the sorted COO row array).  The reference derives
  per-node slices from offsets for its sequential loops; vectorized
  segment ops want explicit segment ids, and storing them costs the same
  memory as the reference's second CSR while making every algorithm a
  pure gather/segment-reduce.
* Graphs are immutable pytrees — they can be passed straight into
  ``jax.jit`` / ``shard_map``.  Mutation (the reference's adjacency-list
  graphs) lives in :mod:`graph_tpu.graph.adj` as an edge buffer + rebuild.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class CsrLayout(enum.Enum):
    """Neighbor-list organization within the CSR target array.

    Mirrors ``CsrLayout`` (crates/builder/src/graph/csr.rs:34-45):

    * ``UNSORTED`` — per-node lists keep input order (default).
    * ``SORTED`` — per-node lists sorted by target id; duplicates kept.
    * ``DEDUPLICATED`` — sorted, duplicate targets removed, self-loops
      removed (csr.rs:897-948).
    """

    UNSORTED = "unsorted"
    SORTED = "sorted"
    DEDUPLICATED = "deduplicated"


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )


@dataclasses.dataclass(frozen=True)
class Csr:
    """One adjacency direction in compressed-sparse-row form.

    ``offsets[u] : offsets[u+1]`` is node ``u``'s slice of ``targets``.
    ``sources[e]`` is the row owning edge ``e`` (ascending).  ``values``
    is the optional per-edge value array (reference ``EV``).
    """

    offsets: jax.Array  # (n+1,) id dtype
    sources: jax.Array  # (m,)   id dtype, ascending
    targets: jax.Array  # (m,)   id dtype
    values: Optional[jax.Array] = None  # (m,) value dtype

    # -- static shape helpers (usable under jit: shapes are static) ------

    @property
    def node_count(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def edge_count(self) -> int:
        return self.targets.shape[0]

    @property
    def id_dtype(self):
        return self.targets.dtype

    def degrees(self) -> jax.Array:
        """Per-node degree vector (reference: csr.rs degree via offsets)."""
        return jnp.diff(self.offsets)

    def degree(self, node: int) -> jax.Array:
        return self.offsets[node + 1] - self.offsets[node]

    # -- host-side accessors (not for use under jit) ----------------------

    def neighbors_np(self, node: int) -> np.ndarray:
        """Host copy of one neighbor list (API layer caches instead)."""
        o = np.asarray(self.offsets[node : node + 2])
        return np.asarray(self.targets[int(o[0]) : int(o[1])])


_register(Csr, data_fields=("offsets", "sources", "targets", "values"), meta_fields=())


@dataclasses.dataclass(frozen=True)
class DirectedCsrGraph:
    """Directed graph: out-CSR + in-CSR (+ optional node values).

    Reference analog: ``DirectedCsrGraph`` (csr.rs:364-368).  ``csr_out``
    rows are sources, targets are destinations; ``csr_in`` rows are
    destinations, targets are sources.
    """

    csr_out: Csr
    csr_in: Csr
    node_values: Optional[jax.Array] = None
    layout: CsrLayout = CsrLayout.UNSORTED

    @property
    def node_count(self) -> int:
        return self.csr_out.node_count

    @property
    def edge_count(self) -> int:
        # Reference: directed edge_count == out-CSR target length
        # (csr.rs Graph impl for DirectedCsrGraph).
        return self.csr_out.edge_count

    def out_degrees(self) -> jax.Array:
        return self.csr_out.degrees()

    def in_degrees(self) -> jax.Array:
        return self.csr_in.degrees()


_register(
    DirectedCsrGraph,
    data_fields=("csr_out", "csr_in", "node_values"),
    meta_fields=("layout",),
)


@dataclasses.dataclass(frozen=True)
class UndirectedCsrGraph:
    """Undirected graph: single CSR holding both edge directions.

    Reference analog: ``UndirectedCsrGraph`` (csr.rs:658-690) — every
    input edge ``(u, v)`` appears as both ``u→v`` and ``v→u``;
    ``edge_count`` is ``targets.len() / 2`` (csr.rs:687-689).
    """

    csr: Csr
    node_values: Optional[jax.Array] = None
    layout: CsrLayout = CsrLayout.UNSORTED

    @property
    def node_count(self) -> int:
        return self.csr.node_count

    @property
    def edge_count(self) -> int:
        return self.csr.edge_count // 2

    def degrees(self) -> jax.Array:
        return self.csr.degrees()


_register(
    UndirectedCsrGraph,
    data_fields=("csr", "node_values"),
    meta_fields=("layout",),
)
