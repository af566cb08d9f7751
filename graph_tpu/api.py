"""User-facing API: ``Graph`` / ``DiGraph`` classes.

Reference analog: the ``graph_mate`` PyO3 bindings (crates/mate/src/):
``Graph`` (undirected, u32 ids), ``DiGraph`` (directed), ``Layout``,
``FileFormat``, result classes with timing, kwargs-only algorithm
configs (crates/mate/graph_mate.pyi:1-199).

Zero-copy semantics: neighbor queries return numpy *views* into one
cached host copy of the CSR arrays (the analog of mate's
``SharedSlice`` aliasing Rust memory, crates/mate/src/graphs/
shared_slice.rs:29-161) — views stay valid after the graph is dropped
because they hold the base buffer alive, which is what the reference's
PyCapsule-owner machinery emulates manually.

Example (mirrors the runnable examples on every public API in the
reference, crates/builder/src/lib.rs:44-251):

    >>> import numpy as np
    >>> from graph_tpu.api import Graph, DiGraph, Layout
    >>> g = Graph.from_numpy(np.array([[0, 1], [1, 2], [2, 0]],
    ...                               dtype=np.uint32), layout=Layout.Sorted)
    >>> (g.node_count(), g.edge_count())
    (3, 3)
    >>> g.degree(0)
    2
    >>> sorted(g.copy_neighbors(1))
    [0, 2]
    >>> g.global_triangle_count().triangles
    1
    >>> dg = DiGraph.from_numpy(np.array([[0, 1], [0, 2]], dtype=np.uint32))
    >>> (dg.out_degree(0), dg.in_degree(2))
    (2, 1)
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import importlib

_pagerank = importlib.import_module("graph_tpu.algos.pagerank")
_sssp = importlib.import_module("graph_tpu.algos.sssp")
_tc = importlib.import_module("graph_tpu.algos.triangle_count")
# the package re-exports a `wcc` *function*, shadowing the submodule
# attribute — import_module resolves the real module
_wcc = importlib.import_module("graph_tpu.algos.wcc")
from graph_tpu.graph.build import build_directed, build_undirected
from graph_tpu.graph.csr import CsrLayout, DirectedCsrGraph, UndirectedCsrGraph
from graph_tpu.graph import ops as _ops


class Layout:
    """mate ``Layout`` analog (graphs/mod.rs:50-75)."""

    Sorted = CsrLayout.SORTED
    Unsorted = CsrLayout.UNSORTED
    Deduplicated = CsrLayout.DEDUPLICATED


class FileFormat:
    """mate ``FileFormat`` analog."""

    Graph500 = "graph500"
    EdgeList = "edge-list"


class PageRankResult:
    """mate ``PageRankResult`` analog (crates/mate/src/page_rank.rs:42-74).

    ``scores()`` downloads the device array on FIRST call and caches the
    numpy view (the reference's scores() is a zero-copy numpy alias,
    page_rank.rs:52-60; here the device->host transfer is the analog and
    is deferred so constructing a result never stalls on the transfer
    link — at scale 22 an eager download costs minutes on a slow
    device->host path, see PERF_NOTES "transfer asymmetry").
    """

    def __init__(self, inner: _pagerank.PageRankResult):
        self._device_scores = inner.scores
        self._scores = None
        self.ran_iterations = inner.ran_iterations
        self.error = inner.error
        self.micros = inner.micros

    def scores(self) -> np.ndarray:
        if self._scores is None:
            self._scores = np.asarray(self._device_scores)
        return self._scores

    def __repr__(self):
        return (
            f"PageRankResult {{ ran_iterations: {self.ran_iterations}, "
            f"error: {self.error}, took: {self.micros}us }}"
        )


class WccResult:
    """mate ``WccResult`` analog (crates/mate/src/wcc.rs:43-88)."""

    def __init__(self, inner: _wcc.WccResult):
        self._device_components = inner.components
        self._components = None  # downloaded lazily, like PageRankResult
        self.micros = inner.micros

    def components(self) -> np.ndarray:
        if self._components is None:
            self._components = np.asarray(self._device_components)
        return self._components

    def __repr__(self):
        return f"WccResult {{ took: {self.micros}us }}"


class TriangleCountResult:
    """mate ``TriangleCountResult`` analog."""

    def __init__(self, inner: _tc.TriangleCountResult):
        self.triangles = inner.triangles
        self.micros = inner.micros

    def __repr__(self):
        return (
            f"TriangleCountResult {{ triangles: {self.triangles}, "
            f"took: {self.micros}us }}"
        )


class SsspResult:
    """Server sssp analog (no mate class; server exposes it)."""

    def __init__(self, inner: _sssp.SsspResult):
        self._distances = np.asarray(inner.distances)
        self.micros = inner.micros

    def distances(self) -> np.ndarray:
        return self._distances


def _load_coo(path, file_format, weighted=False):
    if file_format == FileFormat.Graph500:
        from graph_tpu.io.graph500 import read_graph500

        src, dst, n = read_graph500(path)
        return src, dst, None, n
    from graph_tpu.io.edgelist import read_edge_list

    src, dst, values = read_edge_list(path, weighted or None)
    return src, dst, values, None


class _GraphBase:
    def __init__(self, inner, load_micros=0):
        self._g = inner
        self._load_micros = load_micros
        self._host_cache = {}

    def node_count(self) -> int:
        return self._g.node_count

    def edge_count(self) -> int:
        return self._g.edge_count

    def _np(self, key, arr):
        cached = self._host_cache.get(key)
        if cached is None:
            cached = np.asarray(arr)
            self._host_cache[key] = cached
        return cached

    def _neighbor_view(self, csr_key, csr, node) -> np.ndarray:
        offsets = self._np(csr_key + ".offsets", csr.offsets)
        targets = self._np(csr_key + ".targets", csr.targets)
        view = targets[offsets[node] : offsets[node + 1]]
        view.flags.writeable = False
        return view


class Graph(_GraphBase):
    """Undirected graph with 32-bit node ids (mate ``Graph`` analog)."""

    @staticmethod
    def load(path: str, layout=Layout.Unsorted, file_format=FileFormat.Graph500) -> "Graph":
        t0 = time.perf_counter()
        src, dst, values, n = _load_coo(path, file_format)
        g = build_undirected(src, dst, values, node_count=n, layout=layout)
        return Graph(g, load_micros=int((time.perf_counter() - t0) * 1e6))

    @staticmethod
    def from_numpy(arr: np.ndarray, layout=Layout.Unsorted) -> "Graph":
        arr = np.asarray(arr)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise ValueError(f"expected (m, 2) edge array, got {arr.shape}")
        return Graph(build_undirected(arr[:, 0], arr[:, 1], layout=layout))

    @staticmethod
    def from_pandas(df, layout=Layout.Unsorted) -> "Graph":
        return Graph.from_numpy(df.to_numpy(), layout=layout)

    def degree(self, node: int) -> int:
        offsets = self._np("csr.offsets", self._g.csr.offsets)
        return int(offsets[node + 1] - offsets[node])

    def neighbors(self, node: int) -> np.ndarray:
        return self._neighbor_view("csr", self._g.csr, node)

    def copy_neighbors(self, node: int) -> list:
        return self.neighbors(node).tolist()

    def make_degree_ordered(self) -> None:
        """In-place degree-descending relabel (mate semantics)."""
        self._g = _ops.make_degree_ordered(self._g)
        self._host_cache.clear()

    def global_triangle_count(self) -> TriangleCountResult:
        return TriangleCountResult(_tc.global_triangle_count(self._g))

    def wcc(self, *, chunk_size=None, neighbor_rounds=None, sampling_size=None) -> WccResult:
        cfg = _wcc.WccConfig(
            chunk_size=chunk_size or _wcc.WccConfig.DEFAULT_CHUNK_SIZE,
            neighbor_rounds=neighbor_rounds or _wcc.WccConfig.DEFAULT_NEIGHBOR_ROUNDS,
            sampling_size=sampling_size or _wcc.WccConfig.DEFAULT_SAMPLING_SIZE,
        )
        return WccResult(_wcc.wcc(self._g, cfg))

    def __repr__(self):
        return (
            f"Graph {{ node_count: {self.node_count()}, "
            f"edge_count: {self.edge_count()}, load_took: {self._load_micros}us }}"
        )


class DiGraph(_GraphBase):
    """Directed graph with 32-bit node ids (mate ``DiGraph`` analog)."""

    @staticmethod
    def load(path: str, layout=Layout.Unsorted, file_format=FileFormat.Graph500) -> "DiGraph":
        t0 = time.perf_counter()
        src, dst, values, n = _load_coo(path, file_format)
        g = build_directed(src, dst, values, node_count=n, layout=layout)
        return DiGraph(g, load_micros=int((time.perf_counter() - t0) * 1e6))

    @staticmethod
    def from_numpy(arr: np.ndarray, layout=Layout.Unsorted) -> "DiGraph":
        arr = np.asarray(arr)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise ValueError(f"expected (m, 2) edge array, got {arr.shape}")
        return DiGraph(build_directed(arr[:, 0], arr[:, 1], layout=layout))

    @staticmethod
    def from_pandas(df, layout=Layout.Unsorted) -> "DiGraph":
        return DiGraph.from_numpy(df.to_numpy(), layout=layout)

    def out_degree(self, node: int) -> int:
        offsets = self._np("out.offsets", self._g.csr_out.offsets)
        return int(offsets[node + 1] - offsets[node])

    def in_degree(self, node: int) -> int:
        offsets = self._np("in.offsets", self._g.csr_in.offsets)
        return int(offsets[node + 1] - offsets[node])

    def out_neighbors(self, node: int) -> np.ndarray:
        return self._neighbor_view("out", self._g.csr_out, node)

    def in_neighbors(self, node: int) -> np.ndarray:
        return self._neighbor_view("in", self._g.csr_in, node)

    def copy_out_neighbors(self, node: int) -> list:
        return self.out_neighbors(node).tolist()

    def copy_in_neighbors(self, node: int) -> list:
        return self.in_neighbors(node).tolist()

    def to_undirected(self, layout=None) -> Graph:
        return Graph(_ops.to_undirected(self._g, layout))

    def page_rank(self, *, max_iterations=None, tolerance=None, damping_factor=None) -> PageRankResult:
        cfg = _pagerank.PageRankConfig(
            max_iterations=(
                max_iterations
                if max_iterations is not None
                else _pagerank.PageRankConfig.DEFAULT_MAX_ITERATIONS
            ),
            tolerance=(
                tolerance
                if tolerance is not None
                else _pagerank.PageRankConfig.DEFAULT_TOLERANCE
            ),
            damping_factor=(
                damping_factor
                if damping_factor is not None
                else _pagerank.PageRankConfig.DEFAULT_DAMPING_FACTOR
            ),
        )
        return PageRankResult(_pagerank.page_rank(self._g, cfg))

    def wcc(self, *, chunk_size=None, neighbor_rounds=None, sampling_size=None) -> WccResult:
        cfg = _wcc.WccConfig(
            chunk_size=chunk_size or _wcc.WccConfig.DEFAULT_CHUNK_SIZE,
            neighbor_rounds=neighbor_rounds or _wcc.WccConfig.DEFAULT_NEIGHBOR_ROUNDS,
            sampling_size=sampling_size or _wcc.WccConfig.DEFAULT_SAMPLING_SIZE,
        )
        return WccResult(_wcc.wcc(self._g, cfg))

    def delta_stepping(self, *, start_node: int, delta: float) -> SsspResult:
        return SsspResult(
            _sssp.delta_stepping(self._g, _sssp.DeltaSteppingConfig(start_node, delta))
        )

    def __repr__(self):
        return (
            f"DiGraph {{ node_count: {self.node_count()}, "
            f"edge_count: {self.edge_count()}, load_took: {self._load_micros}us }}"
        )
