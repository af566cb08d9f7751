"""Mutable adjacency-list graphs: edge buffer + snapshot CSR rebuild.

Reference analog: ``DirectedALGraph`` / ``UndirectedALGraph``
(crates/builder/src/graph/adj_list.rs:16-601) — mutable graphs built on
``Vec<RwLock<Vec<Target>>>`` with per-insert layout maintenance, plus
the ``EdgeMutation`` / ``EdgeMutationWithValues`` traits
(crates/builder/src/lib.rs:414-456).

TPU redesign: device arrays are immutable, so mutation is a host-side
COO append buffer; reads snapshot the buffer into an immutable CSR
graph (rebuilt lazily, cached until the next mutation).  The observable
semantics match the reference: the layout is applied to neighbor lists
(the reference maintains it per insert, we apply it per snapshot) and
adding an edge to an unknown node raises (adj_list.rs MissingNode).
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from graph_tpu.errors import GraphError
from graph_tpu.graph.build import build_directed, build_undirected
from graph_tpu.graph.csr import CsrLayout


class MissingNode(GraphError):
    """Reference analog: ``Error::MissingNode`` (builder/src/lib.rs)."""

    def __init__(self, node):
        super().__init__(f"Node {node} does not exist in the graph")


class _ALGraphBase:
    def __init__(self, node_count: int, edges=None, values=None,
                 layout=CsrLayout.UNSORTED, id_dtype=np.int32):
        self._node_count = int(node_count)
        self._id_dtype = id_dtype
        edges = [] if edges is None else list(edges)
        self._src = [int(s) for s, _ in edges]
        self._dst = [int(t) for _, t in edges]
        self._values = None
        if values is not None:
            self._values = [float(v) for v in values]
        self.layout = layout
        self._snapshot = None
        # The reference's AL graphs are safe under parallel insertion
        # (adj_list.rs:16-19 Vec<RwLock<Vec<Target>>>; parallel-mutation
        # tests adj_list.rs:895-910).  The COO buffer here appends to
        # two (three) lists, so concurrent add_edge calls could
        # interleave and misalign src/dst pairs without this lock.
        self._mutate_lock = threading.Lock()

    @property
    def node_count(self) -> int:
        return self._node_count

    @property
    def edge_count(self) -> int:
        return len(self._src)

    def _check_node(self, node: int):
        if not (0 <= node < self._node_count):
            raise MissingNode(node)

    def add_edge(self, source: int, target: int) -> None:
        """EdgeMutation::add_edge analog (lib.rs:414-433)."""
        if self._values is not None:
            raise GraphError("weighted graph requires add_edge_with_value")
        self._check_node(source)
        self._check_node(target)
        with self._mutate_lock:
            self._src.append(int(source))
            self._dst.append(int(target))
            self._snapshot = None

    def add_edge_with_value(self, source: int, target: int, value: float) -> None:
        """EdgeMutationWithValues analog (lib.rs:435-456)."""
        self._check_node(source)
        self._check_node(target)
        with self._mutate_lock:
            if self._values is None:
                if self._src:
                    raise GraphError(
                        "unweighted graph cannot take weighted edges")
                self._values = []
            self._src.append(int(source))
            self._dst.append(int(target))
            self._values.append(float(value))
            self._snapshot = None

    def _build(self):
        raise NotImplementedError

    def snapshot(self):
        """Immutable CSR view of the current edge buffer."""
        if self._snapshot is None:
            self._snapshot = self._build()
        return self._snapshot

    # convenience passthroughs
    def degrees(self) -> np.ndarray:
        g = self.snapshot()
        csr = g.csr_out if hasattr(g, "csr_out") else g.csr
        return np.diff(np.asarray(csr.offsets))

    def neighbors(self, node: int) -> np.ndarray:
        self._check_node(node)
        g = self.snapshot()
        csr = g.csr_out if hasattr(g, "csr_out") else g.csr
        offsets = np.asarray(csr.offsets)
        return np.asarray(csr.targets)[offsets[node] : offsets[node + 1]]


class DirectedALGraph(_ALGraphBase):
    """adj_list.rs:279-283 analog."""

    def _build(self):
        src = np.asarray(self._src, dtype=np.int64)
        dst = np.asarray(self._dst, dtype=np.int64)
        vals = np.asarray(self._values, dtype=np.float32) if self._values is not None else None
        return build_directed(
            src.reshape(-1), dst.reshape(-1), vals,
            node_count=self._node_count, layout=self.layout,
            id_dtype=self._id_dtype,
        )


class UndirectedALGraph(_ALGraphBase):
    """adj_list.rs:452-455 analog."""

    def _build(self):
        src = np.asarray(self._src, dtype=np.int64)
        dst = np.asarray(self._dst, dtype=np.int64)
        vals = np.asarray(self._values, dtype=np.float32) if self._values is not None else None
        return build_undirected(
            src.reshape(-1), dst.reshape(-1), vals,
            node_count=self._node_count, layout=self.layout,
            id_dtype=self._id_dtype,
        )
