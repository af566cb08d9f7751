"""Delta-stepping SSSP tests (reference: sssp.rs:283-313 golden)."""

import numpy as np
import pytest

from graph_tpu import DeltaSteppingConfig, GraphBuilder, delta_stepping
from graph_tpu.algos.sssp import INF


def golden_graph():
    gdl = """(a:A)
             (b:B)
             (c:C)
             (d:D)
             (e:E)
             (f:F)
             (a)-[{cost:  4.0 }]->(b)
             (a)-[{cost:  2.0 }]->(c)
             (b)-[{cost:  5.0 }]->(c)
             (b)-[{cost: 10.0 }]->(d)
             (c)-[{cost:  3.0 }]->(e)
             (d)-[{cost: 11.0 }]->(f)
             (e)-[{cost:  4.0 }]->(d)"""
    from graph_tpu.graph.csr import CsrLayout

    return (
        GraphBuilder().csr_layout(CsrLayout.DEDUPLICATED).gdl(gdl).build_directed()
    )


def test_sssp_golden():
    g = golden_graph()
    res = delta_stepping(g, DeltaSteppingConfig(start_node=0, delta=3.0))
    expected = np.array([0.0, 4.0, 2.0, 9.0, 5.0, 20.0], dtype=np.float32)
    assert np.array_equal(res.distances_np(), expected)


def test_sssp_delta_invariance():
    g = golden_graph()
    for delta in (0.5, 1.0, 7.0, 100.0):
        res = delta_stepping(g, DeltaSteppingConfig(start_node=0, delta=delta))
        expected = np.array([0.0, 4.0, 2.0, 9.0, 5.0, 20.0], dtype=np.float32)
        assert np.array_equal(res.distances_np(), expected), delta


def test_sssp_unreachable_is_f32_max():
    g = (
        GraphBuilder()
        .edges_with_values([(0, 1, 1.0)])
        .node_count(3)
        .build_directed()
    )
    res = delta_stepping(g, DeltaSteppingConfig(start_node=0, delta=1.0))
    d = res.distances_np()
    assert d[0] == 0.0 and d[1] == 1.0
    assert d[2] == INF  # f32::MAX, sssp.rs:12


def test_sssp_other_start():
    g = golden_graph()
    res = delta_stepping(g, DeltaSteppingConfig(start_node=1, delta=3.0))
    d = res.distances_np()
    assert d[1] == 0.0
    assert d[2] == 5.0
    assert d[4] == 8.0
    assert d[3] == 10.0  # direct b->d beats b->c->e->d (5+3+4=12)
    assert d[0] == INF


def test_sssp_random_vs_dijkstra():
    rng = np.random.default_rng(42)
    n, m = 200, 1200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.1, 5.0, m).astype(np.float32)
    g = GraphBuilder().coo(src, dst, w).node_count(n).build_directed()
    res = delta_stepping(g, DeltaSteppingConfig(start_node=0, delta=2.0))

    # host Dijkstra
    import heapq

    adj = [[] for _ in range(n)]
    for s, t, ww in zip(src, dst, w):
        adj[int(s)].append((int(t), np.float32(ww)))
    dist = np.full(n, np.inf)
    dist[0] = 0.0
    pq = [(0.0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, ww in adj[u]:
            nd = d + float(ww)
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    ours = res.distances_np().astype(np.float64)
    ours[ours == float(INF)] = np.inf
    np.testing.assert_allclose(ours, dist, rtol=1e-5)


def test_sssp_frontier_golden():
    """Compacted-frontier engine is bit-exact on the reference golden
    (sssp.rs:283-313) for several deltas."""
    g = golden_graph()
    expected = np.array([0.0, 4.0, 2.0, 9.0, 5.0, 20.0], dtype=np.float32)
    for delta in (0.5, 3.0, 100.0):
        res = delta_stepping(
            g, DeltaSteppingConfig(start_node=0, delta=delta,
                                   engine="frontier"))
        assert np.array_equal(res.distances_np(), expected), delta


def test_sssp_frontier_matches_xla_on_grid():
    """Frontier engine == dense delta-stepping on a weighted 2-D grid
    (the high-diameter shape the engine exists for)."""
    side = 24
    n = side * side
    rng = np.random.default_rng(5)
    src, dst = [], []
    for i in range(side):
        for j in range(side):
            u = i * side + j
            if j + 1 < side:
                src += [u, u + 1]
                dst += [u + 1, u]
            if i + 1 < side:
                src += [u, u + side]
                dst += [u + side, u]
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = rng.uniform(0.1, 4.0, src.size).astype(np.float32)
    g = GraphBuilder().coo(src, dst, w).node_count(n).build_directed()
    r_f = delta_stepping(g, DeltaSteppingConfig(0, 2.0, engine="frontier"))
    r_x = delta_stepping(g, DeltaSteppingConfig(0, 2.0, engine="xla"))
    assert np.array_equal(r_f.distances_np(), r_x.distances_np())


@pytest.mark.slow
def test_sssp_auto_picks_frontier_on_low_degree_large_graph():
    """engine="auto" routes large low-max-degree graphs (grids/roads)
    to the compacted-frontier engine, and hubby graphs away from it."""
    from graph_tpu.algos import sssp as sssp_mod

    # path graph: n = 2^16, max degree 1
    n = 1 << 16
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    w = np.ones(n - 1, np.float32)
    g = GraphBuilder().coo(src, dst, w).node_count(n).build_directed()
    assert sssp_mod._max_out_degree(g) == 1
    res = delta_stepping(g, DeltaSteppingConfig(0, 8.0))
    assert getattr(g, "_frontier_adj", None) is not None  # frontier ran
    d = res.distances_np()
    assert d[0] == 0.0 and d[100] == 100.0 and d[n - 1] == n - 1

    # hub graph: one node of degree 2000 -> never the frontier engine
    hub_src = np.zeros(2000, np.int64)
    hub_dst = np.arange(1, 2001)
    hw = np.ones(2000, np.float32)
    gh = (GraphBuilder().coo(hub_src, hub_dst, hw)
          .node_count(1 << 16).build_directed())
    delta_stepping(gh, DeltaSteppingConfig(0, 8.0))
    assert getattr(gh, "_frontier_adj", None) is None


def test_sssp_plan_matches_xla_interpret():
    """EdgeEngine Bellman-Ford == delta-stepping on a random graph."""
    import numpy as np
    import jax.numpy as jnp

    from graph_tpu.graph.build import build_directed
    from graph_tpu.algos.sssp import delta_stepping, DeltaSteppingConfig
    from graph_tpu.engine import engine as eng_mod
    from graph_tpu.engine.engine import EdgeEngine

    g = np.random.default_rng(17)
    n, m = 2000, 9000
    src = g.integers(0, n, m)
    dst = g.integers(0, n, m)
    w = (g.random(m) * 5 + 0.01).astype(np.float32)
    graph = build_directed(jnp.asarray(src), jnp.asarray(dst),
                           values=jnp.asarray(w), node_count=n)
    r_x = delta_stepping(graph, DeltaSteppingConfig(0, 3.0, engine="xla"))
    eng = EdgeEngine.build(src, dst, n, values=w, interpret=True)
    eng_mod._GRAPH_ENGINES[(id(graph), "fwd_weighted")] = eng
    r_p = delta_stepping(graph, DeltaSteppingConfig(0, 3.0, engine="plan"))
    assert np.array_equal(r_x.distances_np(), r_p.distances_np())
