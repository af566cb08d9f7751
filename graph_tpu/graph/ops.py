"""Graph transforms over built graphs.

Reference analog: crates/builder/src/graph_ops.rs — degree-descending
relabel (graph_ops.rs:135-174,511-638), to_undirected
(graph_ops.rs:176-230; csr.rs:391-464), degree partitioning
(graph_ops.rs:17-50,331-440).

TPU redesign: relabel = one argsort + gather-permute CSR rebuild; no
SharedMut scatter.  Graphs are immutable pytrees, so every op returns a
new graph (the reference mutates in place via ``swap_csr``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from graph_tpu.errors import InvalidPartitioning
from graph_tpu.graph.build import csr_from_coo
from graph_tpu.graph.csr import (
    Csr,
    CsrLayout,
    DirectedCsrGraph,
    UndirectedCsrGraph,
)


def degree_order_permutation(degrees: np.ndarray) -> np.ndarray:
    """Map old node id → new node id, degree-descending.

    Exact reference semantics (graph_ops.rs:542-558): pairs
    ``(degree, node)`` sorted by the reversed tuple ordering — descending
    degree, ties broken by *descending* old node id.
    """
    n = degrees.shape[0]
    order = np.lexsort((-np.arange(n), -degrees.astype(np.int64)))
    new_id = np.empty(n, dtype=np.int64)
    new_id[order] = np.arange(n)
    return new_id


def make_degree_ordered(graph: UndirectedCsrGraph) -> UndirectedCsrGraph:
    """Relabel node ids by descending degree; returns a new graph.

    Reference analog: ``RelabelByDegreeOp::make_degree_ordered``
    (graph_ops.rs:135-174).  The result always has sorted neighbor lists
    (the reference sorts relabeled targets, graph_ops.rs:632); a
    DEDUPLICATED input stays deduplicated.

    >>> import numpy as np
    >>> from graph_tpu.graph.build import build_undirected
    >>> g = build_undirected([3, 3, 3, 0], [0, 1, 2, 1], node_count=4)
    >>> g2 = make_degree_ordered(g)  # hub node 3 becomes node 0
    >>> np.diff(np.asarray(g2.csr.offsets)).tolist()
    [3, 2, 2, 1]
    """
    csr = graph.csr
    degrees = np.diff(np.asarray(csr.offsets))
    new_id = degree_order_permutation(degrees)
    layout = (
        CsrLayout.DEDUPLICATED
        if graph.layout is CsrLayout.DEDUPLICATED
        else CsrLayout.SORTED
    )

    if isinstance(csr.targets, np.ndarray):
        # host-resident graph (build_undirected_host): relabel in numpy
        # so the result stays host-resident (device->host downloads run
        # at ~0.2 MB/s on the tunnel — triangle counting reads these
        # arrays back on the host right after)
        dt = csr.targets.dtype
        rows = new_id[csr.sources].astype(dt)
        cols = new_id[csr.targets].astype(dt)
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        vals = None if csr.values is None else csr.values[order]
        offsets = np.searchsorted(
            rows, np.arange(graph.node_count + 1)).astype(dt)
        new_csr = Csr(offsets=offsets, sources=rows, targets=cols,
                      values=vals)
    else:
        new_id_dev = jnp.asarray(new_id.astype(np.asarray(csr.targets).dtype))
        rows = new_id_dev[csr.sources]
        cols = new_id_dev[csr.targets]
        new_csr = csr_from_coo(
            rows,
            cols,
            csr.values,
            node_count=graph.node_count,
            layout=CsrLayout.SORTED,  # relabel never re-dedups; sorted lists
            id_dtype=csr.targets.dtype,
        )
    node_values = graph.node_values
    if node_values is not None:
        inv = np.empty_like(new_id)
        inv[new_id] = np.arange(len(new_id))
        node_values = jnp.asarray(np.asarray(node_values)[inv])
    return UndirectedCsrGraph(csr=new_csr, node_values=node_values, layout=layout)


def to_undirected(
    graph: DirectedCsrGraph, layout: Optional[CsrLayout] = None
) -> UndirectedCsrGraph:
    """Directed → undirected by streaming out-edges both ways.

    Reference analog: ``ToUndirectedOp`` (graph_ops.rs:176-230,
    csr.rs:391-464); default layout is UNSORTED (``CsrLayout::default``).
    """
    layout = layout or CsrLayout.UNSORTED
    out = graph.csr_out
    rows = jnp.concatenate([out.sources, out.targets])
    cols = jnp.concatenate([out.targets, out.sources])
    vals = (
        jnp.concatenate([out.values, out.values]) if out.values is not None else None
    )
    csr = csr_from_coo(
        rows,
        cols,
        vals,
        node_count=graph.node_count,
        layout=layout,
        id_dtype=out.targets.dtype,
    )
    return UndirectedCsrGraph(
        csr=csr, node_values=graph.node_values, layout=layout
    )


def degree_partition(degrees: np.ndarray, concurrency: int) -> list:
    """Greedy ranges of ≈equal total degree.

    Reference analog: ``degree_partition`` / ``greedy_node_map_partition``
    (graph_ops.rs:331-440).  On a single TPU chip dense kernels make this
    unnecessary; it is the host-side analog used to row-block the CSR
    for multi-chip sharding (SURVEY.md §5).

    >>> degree_partition([1, 1, 1, 1], 2)
    [(0, 2), (2, 4)]
    >>> degree_partition([9, 1, 1, 1], 2)  # hub gets its own range
    [(0, 1), (1, 4)]
    """
    degrees = np.asarray(degrees, dtype=np.int64)
    if concurrency < 1:
        # Reference: partitioning with an invalid config is an
        # Error::InvalidPartitioning (builder/src/lib.rs:274-302), not a
        # silent clamp.
        raise InvalidPartitioning(
            f"concurrency must be >= 1, got {concurrency}")
    if (degrees < 0).any():
        raise InvalidPartitioning("degrees must be non-negative")
    n = degrees.shape[0]
    total = int(degrees.sum()) + n
    batch = max(total // concurrency, 1)
    partitions = []
    start = 0
    acc = 0
    for u in range(n):
        acc += int(degrees[u]) + 1
        if acc >= batch and u + 1 > start:
            partitions.append((start, u + 1))
            start = u + 1
            acc = 0
    if start < n or not partitions:
        partitions.append((start, n))
    return partitions
