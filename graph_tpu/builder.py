"""Fluent graph builder.

Reference analog: the type-state ``GraphBuilder``
(crates/builder/src/builder.rs:12-540) with states
``Uninitialized → FromEdges | FromEdgesWithValues | FromGdlString |
FromInput → FromPath → build()``.

Python redesign: one fluent class; the target graph type is chosen at
``build(...)`` (the reference selects it via the turbofish type
parameter, builder.rs:530).

Runnable example (mirrors the reference's builder doctest,
crates/builder/src/lib.rs:44-96):

>>> from graph_tpu import GraphBuilder
>>> g = GraphBuilder().edges([(0, 1), (0, 2), (1, 2)]).build_directed()
>>> (int(g.node_count), int(g.edge_count))
(3, 3)
>>> [int(t) for t in g.csr_out.neighbors_np(0)]
[1, 2]
>>> w = (GraphBuilder()
...      .edges_with_values([(0, 1, 0.5), (1, 2, 0.25)])
...      .build_directed())
>>> float(w.csr_out.values[0])
0.5
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple, Union

import numpy as np

from graph_tpu.errors import GraphError, InvalidNodeValues
from graph_tpu.graph.build import (build_directed, build_undirected,
                                   build_undirected_host)
from graph_tpu.graph.csr import CsrLayout, DirectedCsrGraph, UndirectedCsrGraph


class GraphBuilder:
    def __init__(self):
        self._layout = CsrLayout.UNSORTED
        self._id_dtype = np.int32
        self._src = None
        self._dst = None
        self._values = None
        self._node_values = None
        self._node_count = None
        self._prebuilt = None  # full graph loaded by BinaryInput

    # -- configuration ----------------------------------------------------

    def csr_layout(self, layout: CsrLayout) -> "GraphBuilder":
        """builder.rs:173 analog."""
        self._layout = layout
        return self

    def id_dtype(self, dtype) -> "GraphBuilder":
        """``Idx`` type-parameter analog (int32 default, int64 supported)."""
        self._id_dtype = dtype
        return self

    def node_count(self, n: int) -> "GraphBuilder":
        """Override the inferred max_node_id + 1."""
        self._node_count = int(n)
        return self

    # -- inputs -------------------------------------------------------------

    def edges(self, edges: Iterable[Tuple[int, int]]) -> "GraphBuilder":
        """builder.rs ``edges()`` analog. Accepts (m,2) arrays or tuples."""
        arr = np.asarray(list(edges) if not isinstance(edges, np.ndarray) else edges)
        if arr.size == 0:
            arr = arr.reshape(0, 2)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise GraphError(f"edges must be (m, 2)-shaped, got {arr.shape}")
        self._src, self._dst = arr[:, 0], arr[:, 1]
        return self

    def edges_with_values(
        self, edges: Iterable[Tuple[int, int, float]]
    ) -> "GraphBuilder":
        """builder.rs ``edges_with_values()`` analog."""
        rows = list(edges) if not isinstance(edges, np.ndarray) else edges
        arr = np.asarray([(s, t) for s, t, _ in rows], dtype=np.int64)
        if arr.size == 0:
            arr = arr.reshape(0, 2)
        self._src, self._dst = arr[:, 0], arr[:, 1]
        self._values = np.asarray([v for _, _, v in rows], dtype=np.float32)
        return self

    def coo(self, src, dst, values=None) -> "GraphBuilder":
        """Zero-copy array input (graph_mate ``from_numpy`` analog,
        crates/mate/src/graphs/mod.rs:169-200)."""
        self._src = np.asarray(src)
        self._dst = np.asarray(dst)
        self._values = None if values is None else np.asarray(values, dtype=np.float32)
        return self

    def node_values(self, values: Sequence) -> "GraphBuilder":
        """builder.rs ``node_values()`` analog."""
        self._node_values = np.asarray(values)
        return self

    def gdl(self, gdl: str) -> "GraphBuilder":
        """builder.rs ``gdl_str()`` analog (test DSL, input/gdl.rs)."""
        from graph_tpu.io.gdl import parse_gdl

        src, dst, values, node_count = parse_gdl(gdl)
        self._src, self._dst = src, dst
        self._values = values
        if self._node_count is None:
            self._node_count = node_count
        return self

    def file_format(self, fmt) -> "GraphBuilder":
        """builder.rs ``file_format()`` analog; fmt from graph_tpu.io."""
        self._format = fmt
        return self

    def path(self, path: str) -> "GraphBuilder":
        """builder.rs ``path()`` analog — requires file_format first."""
        fmt = getattr(self, "_format", None)
        if fmt is None:
            from graph_tpu.io.edgelist import EdgeListInput

            fmt = EdgeListInput()
        if hasattr(fmt, "read_graph"):
            # snapshot formats carry a whole graph (input/binary.rs:21-28)
            self._prebuilt = fmt.read_graph(path, self._id_dtype)
            return self
        src, dst, values, node_count = fmt.read(path)
        self._src, self._dst, self._values = src, dst, values
        if self._node_count is None and node_count is not None:
            self._node_count = node_count
        return self

    # -- build --------------------------------------------------------------

    def _check(self):
        if self._src is None and self._prebuilt is None:
            raise GraphError("no edge input provided (edges/coo/gdl/path)")
        if self._node_values is not None:
            n = self._node_count
            if n is None:
                n = int(max(self._src.max(), self._dst.max())) + 1 if self._src.size else 0
            if len(self._node_values) != n:
                raise InvalidNodeValues(
                    f"node_values has {len(self._node_values)} entries, "
                    f"graph has {n} nodes"
                )

    def build_directed(self) -> DirectedCsrGraph:
        self._check()
        if self._prebuilt is not None:
            if not isinstance(self._prebuilt, DirectedCsrGraph):
                raise GraphError("snapshot contains an undirected graph")
            return self._prebuilt
        return build_directed(
            self._src,
            self._dst,
            self._values,
            node_count=self._node_count,
            layout=self._layout,
            id_dtype=self._id_dtype,
            node_values=self._node_values,
        )

    def build_undirected(self, host: bool = False) -> UndirectedCsrGraph:
        """``host=True`` keeps the CSR in host (numpy) arrays — for
        pipelines whose next step reads the edge list back on the host
        (triangle counting): a device-built graph costs minutes to
        download through the TPU tunnel (graph/build.py
        build_undirected_host)."""
        self._check()
        if self._prebuilt is not None:
            if not isinstance(self._prebuilt, UndirectedCsrGraph):
                raise GraphError("snapshot contains a directed graph")
            return self._prebuilt
        build = build_undirected_host if host else build_undirected
        return build(
            self._src,
            self._dst,
            self._values,
            node_count=self._node_count,
            layout=self._layout,
            id_dtype=self._id_dtype,
            node_values=self._node_values,
        )

    def build(self, graph_type=DirectedCsrGraph):
        """``.build::<G>()`` analog: pass the target class."""
        if graph_type is DirectedCsrGraph:
            return self.build_directed()
        if graph_type is UndirectedCsrGraph:
            return self.build_undirected()
        raise GraphError(f"unknown graph type {graph_type!r}")
