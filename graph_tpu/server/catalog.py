"""Named-graph catalog + property store.

Reference analog: crates/server/src/catalog.rs:14-288 — ``GraphType``
enum over directed/undirected (we hold the pytree graphs directly),
named-graph map, and a ``PropertyId -> record batches`` store chunked at
10,000 rows (server.rs:34).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Tuple

import numpy as np

from graph_tpu.errors import GraphNotFound
from graph_tpu.graph.csr import DirectedCsrGraph, UndirectedCsrGraph

CHUNK_SIZE = 10_000  # rows per record batch (server.rs:34)


def graph_type_name(g) -> str:
    if isinstance(g, DirectedCsrGraph):
        return "Directed" if g.csr_out.values is None else "DirectedWeighted"
    return "Undirected" if g.csr.values is None else "UndirectedWeighted"


class GraphCatalog:
    """Thread-safe named graph map (catalog.rs:148-213)."""

    def __init__(self):
        self._graphs = {}
        self._lock = threading.RLock()

    def get(self, name: str):
        with self._lock:
            try:
                return self._graphs[name]
            except KeyError:
                raise GraphNotFound(f"Graph with name '{name}' not found")

    def insert(self, name: str, graph) -> None:
        with self._lock:
            self._graphs[name] = graph

    def remove(self, name: str) -> Tuple[str, str, int, int]:
        """Remove and return the graph's info tuple.

        The reference returns the removed graph's ``GraphInfo``
        (catalog.rs:191-205), which the server serializes back to the
        client (server.rs:333-339).
        """
        with self._lock:
            if name not in self._graphs:
                raise GraphNotFound(f"Graph with name '{name}' not found")
            g = self._graphs.pop(name)
            return (name, graph_type_name(g), g.node_count, g.edge_count)

    def list(self) -> List[Tuple[str, str, int, int]]:
        with self._lock:
            return [
                (name, graph_type_name(g), g.node_count, g.edge_count)
                for name, g in self._graphs.items()
            ]


class PropertyStore:
    """(graph, key) -> result column as record batches (catalog.rs:240-268)."""

    def __init__(self):
        self._props: Dict[Tuple[str, str], list] = {}
        self._lock = threading.RLock()

    def insert(self, graph_name: str, key: str, field_name: str, values: np.ndarray):
        import pyarrow as pa

        values = np.asarray(values)
        batches = []
        schema = pa.schema([pa.field(field_name, pa.from_numpy_dtype(values.dtype))])
        for i in range(0, len(values), CHUNK_SIZE):
            batches.append(
                pa.record_batch([pa.array(values[i : i + CHUNK_SIZE])], schema=schema)
            )
        if not batches:
            batches.append(pa.record_batch([pa.array(values)], schema=schema))
        with self._lock:
            self._props[(graph_name, key)] = batches

    def get(self, graph_name: str, key: str):
        with self._lock:
            try:
                return self._props[(graph_name, key)]
            except KeyError:
                raise GraphNotFound(
                    f"Property '{key}' for graph '{graph_name}' not found"
                )
