"""Graph-transform tests (reference: graph_ops.rs:640-775)."""

import numpy as np
import pytest

from graph_tpu import GraphBuilder, build_undirected
from graph_tpu.graph.csr import CsrLayout
from graph_tpu.graph.ops import (
    degree_order_permutation,
    degree_partition,
    make_degree_ordered,
    to_undirected,
)


def test_degree_order_permutation_ties_desc_node_id():
    # reference: pairs sorted by reversed (degree, node) tuple —
    # equal degrees → higher old id gets the smaller new id
    deg = np.array([2, 5, 2, 7])
    new_id = degree_order_permutation(deg)
    assert new_id.tolist() == [3, 1, 2, 0]


def test_make_degree_ordered():
    # graph_ops.rs doc example analog: star around node 1
    g = build_undirected([0, 1, 1, 1], [1, 2, 3, 0], layout=CsrLayout.SORTED)
    rg = make_degree_ordered(g)
    deg = np.asarray(rg.csr.degrees())
    assert deg.tolist() == sorted(deg.tolist(), reverse=True)
    assert rg.edge_count == g.edge_count
    # neighbor lists are sorted after relabel (graph_ops.rs:632)
    o = np.asarray(rg.csr.offsets)
    t = np.asarray(rg.csr.targets)
    for u in range(rg.node_count):
        row = t[o[u] : o[u + 1]].tolist()
        assert row == sorted(row)


def test_relabel_preserves_triangles():
    from graph_tpu import global_triangle_count

    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)]
    g = build_undirected(
        [e[0] for e in edges], [e[1] for e in edges], layout=CsrLayout.DEDUPLICATED
    )
    rg = make_degree_ordered(g)
    assert global_triangle_count(rg).triangles == 2


def test_to_undirected():
    dg = GraphBuilder().edges([(0, 1), (0, 1), (1, 2)]).build_directed()
    ug = to_undirected(dg)
    assert ug.edge_count == 3
    deg = np.asarray(ug.degrees())
    assert deg.tolist() == [2, 3, 1]


def test_to_undirected_dedup():
    dg = GraphBuilder().edges([(0, 1), (1, 0), (0, 0)]).build_directed()
    ug = to_undirected(dg, CsrLayout.DEDUPLICATED)
    # (0,1)+(1,0) collapse to one undirected edge; self-loop removed
    assert ug.edge_count == 1


def test_to_undirected_keeps_weights():
    dg = GraphBuilder().edges_with_values([(0, 1, 0.5)]).build_directed()
    ug = to_undirected(dg, CsrLayout.SORTED)
    assert np.asarray(ug.csr.values).tolist() == [0.5, 0.5]


def test_degree_partition_covers_all_nodes():
    deg = np.array([100, 1, 1, 1, 100, 1, 1, 1])
    parts = degree_partition(deg, 4)
    assert parts[0][0] == 0
    assert parts[-1][1] == 8
    for (a, b), (c, d) in zip(parts, parts[1:]):
        assert b == c


def test_degree_partition_invalid_raises():
    # reference: Error::InvalidPartitioning (builder/src/lib.rs:274-302)
    from graph_tpu.errors import InvalidPartitioning

    with pytest.raises(InvalidPartitioning):
        degree_partition([1, 2, 3], 0)
    with pytest.raises(InvalidPartitioning):
        degree_partition([1, -2, 3], 2)
