"""Type stubs for the graph_mate-compatible API.

Reference analog: crates/mate/graph_mate.pyi (the reference ships .pyi
stubs for its PyO3 module, graph_mate.pyi:1-199); this file mirrors
that contract for graph_tpu.api.
"""

from typing import Any, List, Optional

import numpy as np

class Layout:
    Sorted: str
    Unsorted: str
    Deduplicated: str

class FileFormat:
    EdgeList: str
    Graph500: str
    DotGraph: str

class PageRankResult:
    ran_iterations: int
    error: float
    micros: int
    def scores(self) -> np.ndarray: ...

class WccResult:
    micros: int
    def components(self) -> np.ndarray: ...

class TriangleCountResult:
    triangles: int
    micros: int

class SsspResult:
    micros: int
    def distances(self) -> np.ndarray: ...

class _GraphBase:
    load_micros: int
    def node_count(self) -> int: ...
    def edge_count(self) -> int: ...

class Graph(_GraphBase):
    @staticmethod
    def load(path: str, layout: str = ..., file_format: str = ...) -> "Graph": ...
    @staticmethod
    def from_numpy(arr: np.ndarray, layout: str = ...) -> "Graph": ...
    @staticmethod
    def from_pandas(df: Any, layout: str = ...) -> "Graph": ...
    def degree(self, node: int) -> int: ...
    def neighbors(self, node: int) -> np.ndarray: ...
    def copy_neighbors(self, node: int) -> List[int]: ...
    def make_degree_ordered(self) -> None: ...
    def global_triangle_count(self) -> TriangleCountResult: ...
    def wcc(
        self,
        *,
        chunk_size: Optional[int] = ...,
        neighbor_rounds: Optional[int] = ...,
        sampling_size: Optional[int] = ...,
    ) -> WccResult: ...

class DiGraph(_GraphBase):
    @staticmethod
    def load(path: str, layout: str = ..., file_format: str = ...) -> "DiGraph": ...
    @staticmethod
    def from_numpy(arr: np.ndarray, layout: str = ...) -> "DiGraph": ...
    @staticmethod
    def from_pandas(df: Any, layout: str = ...) -> "DiGraph": ...
    def out_degree(self, node: int) -> int: ...
    def in_degree(self, node: int) -> int: ...
    def out_neighbors(self, node: int) -> np.ndarray: ...
    def in_neighbors(self, node: int) -> np.ndarray: ...
    def copy_out_neighbors(self, node: int) -> List[int]: ...
    def copy_in_neighbors(self, node: int) -> List[int]: ...
    def to_undirected(self, layout: Optional[str] = ...) -> Graph: ...
    def page_rank(
        self,
        *,
        max_iterations: Optional[int] = ...,
        tolerance: Optional[float] = ...,
        damping_factor: Optional[float] = ...,
    ) -> PageRankResult: ...
    def wcc(
        self,
        *,
        chunk_size: Optional[int] = ...,
        neighbor_rounds: Optional[int] = ...,
        sampling_size: Optional[int] = ...,
    ) -> WccResult: ...
    def delta_stepping(self, *, start_node: int, delta: float) -> SsspResult: ...
