"""Triangle count tests.

Goldens: diamond/two-components (triangle_count.rs:93-130) and the
scale-8 Graph500 count of 227,874
(crates/mate/tests/triangle_count_test.py:5-9).
"""

import numpy as np
import pytest

from graph_tpu import GraphBuilder, global_triangle_count
from graph_tpu.graph.csr import CsrLayout
from graph_tpu.graph.build import build_undirected


def ug(edges, **kw):
    return (
        GraphBuilder()
        .csr_layout(CsrLayout.DEDUPLICATED)
        .edges(edges)
        .build_undirected()
    )


def test_tc_two_components():
    g = ug([(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    assert global_triangle_count(g).triangles == 2


def test_tc_connected_triangles():
    g = ug([(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)])
    assert global_triangle_count(g).triangles == 2


def test_tc_diamond():
    g = ug([(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)])
    assert global_triangle_count(g).triangles == 2


def test_tc_rejects_unsorted():
    g = GraphBuilder().edges([(0, 1)]).build_undirected()
    with pytest.raises(ValueError):
        global_triangle_count(g)


def test_tc_k4():
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert global_triangle_count(ug(edges)).triangles == 4


def test_tc_self_loops_and_dups_ignored():
    g = ug([(0, 1), (1, 2), (2, 0), (0, 0), (1, 0), (0, 1)])
    assert global_triangle_count(g).triangles == 1


def test_tc_scale8_golden(scale8_path):
    # The mate golden (triangle_count_test.py:5-9) runs on the shared
    # Sorted-layout fixture *after* graph_test.py::test_reorder relabeled
    # it: 227,874 is the multiset count on the degree-ordered graph.
    from graph_tpu.io.graph500 import read_graph500
    from graph_tpu.graph.ops import make_degree_ordered

    src, dst, n = read_graph500(scale8_path)
    g = build_undirected(src, dst, node_count=n, layout=CsrLayout.SORTED)
    g = make_degree_ordered(g)
    assert global_triangle_count(g).triangles == 227874


@pytest.mark.slow
def test_tc_scale8_distinct(scale8_path):
    # distinct-triangle count on the DEDUPLICATED graph (the CLI path);
    # host truth via trace(A^3)/6 = 10,508.
    from graph_tpu.io.graph500 import read_graph500

    src, dst, n = read_graph500(scale8_path)
    g = build_undirected(src, dst, node_count=n, layout=CsrLayout.DEDUPLICATED)
    assert global_triangle_count(g).triangles == 10508


def test_tc_sorted_no_dups_matches_dedup():
    # without duplicates/self-loops both semantics agree
    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)]
    gs = build_undirected(
        [e[0] for e in edges], [e[1] for e in edges], layout=CsrLayout.SORTED
    )
    assert global_triangle_count(gs).triangles == 2


def test_tc_crosses_block_boundary():
    # triangle whose vertex ids straddle a 4096 boundary (regression
    # from the round-1 bitmap design; the sort-join TC must not care)
    base = 4090
    edges = [(base, base + 10), (base + 10, base + 20), (base + 20, base)]
    g = build_undirected(
        [e[0] for e in edges],
        [e[1] for e in edges],
        node_count=base + 32,
        layout=CsrLayout.DEDUPLICATED,
    )
    assert global_triangle_count(g).triangles == 1


@pytest.mark.slow
def test_tc_random_vs_host():
    rng = np.random.default_rng(7)
    n, m = 300, 2000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = build_undirected(src, dst, node_count=n, layout=CsrLayout.DEDUPLICATED)

    # host count: strict lower adjacency matrix
    A = np.zeros((n, n), dtype=bool)
    A[src, dst] = True
    A[dst, src] = True
    np.fill_diagonal(A, False)
    expected = int(np.trace(A.astype(np.int64) @ A.astype(np.int64) @ A.astype(np.int64))) // 6
    assert global_triangle_count(g).triangles == expected


@pytest.mark.slow
def test_sortjoin_matches_numpy_reference_rmat():
    """Cross-check the sort-join pipeline against a brute-force host
    count on a scale-12 RMAT graph (hubs exercise chunk splitting and
    the cross-chunk outer products)."""
    import numpy as np

    import graph_tpu as gt
    from graph_tpu.graph.build import build_undirected
    from graph_tpu.graph.csr import CsrLayout

    rng = np.random.default_rng(5)
    n = 1 << 12
    m = n * 12
    # skewed degrees: power-law-ish via squaring uniform draws
    src = (rng.random(m) ** 3 * n).astype(np.int64)
    dst = (rng.random(m) ** 3 * n).astype(np.int64)
    g = build_undirected(src, dst, node_count=n,
                         layout=CsrLayout.DEDUPLICATED)
    got = gt.global_triangle_count(g).triangles

    # numpy reference: distinct triangles via per-edge set intersection
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    e = np.unique(a[keep] * n + b[keep])
    a, b = e // n, e % n
    adj = [set() for _ in range(n)]
    for x, y in zip(a, b):
        adj[x].add(y)
    exp = sum(len(adj[x] & adj[y]) for x, y in zip(a, b))
    assert got == exp
