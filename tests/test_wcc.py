"""WCC tests (reference: wcc.rs:307-329 + mate wcc_test.py)."""

import numpy as np

from graph_tpu import GraphBuilder, WccConfig, build_undirected, wcc


def test_two_components():
    g = GraphBuilder().edges([(0, 1), (2, 3)]).build_directed()
    res = wcc(g, WccConfig())
    assert res.component(0) == res.component(1)
    assert res.component(2) == res.component(3)
    assert res.component(1) != res.component(2)


def test_direction_is_ignored():
    # weakly connected: 0->1<-2 is one component
    g = GraphBuilder().edges([(0, 1), (2, 1)]).build_directed()
    c = np.asarray(wcc(g).components)
    assert c[0] == c[1] == c[2]


def test_chain_long_diameter():
    n = 1000
    edges = [(i, i + 1) for i in range(n - 1)]
    g = GraphBuilder().edges(edges).build_directed()
    c = np.asarray(wcc(g).components)
    assert (c == 0).all()


def test_isolated_nodes_are_singletons():
    g = GraphBuilder().edges([(0, 1)]).node_count(4).build_directed()
    c = np.asarray(wcc(g).components)
    assert c[0] == c[1] == 0
    assert c[2] == 2 and c[3] == 3


def test_undirected_graph():
    g = build_undirected([0, 2], [1, 3], node_count=5)
    c = np.asarray(wcc(g).components)
    assert c[0] == c[1]
    assert c[2] == c[3]
    assert len({int(c[1]), int(c[2]), int(c[4])}) == 3


def test_components_are_min_node_ids():
    g = GraphBuilder().edges([(5, 3), (3, 7), (1, 0)]).build_directed()
    c = np.asarray(wcc(g).components)
    assert c[3] == c[5] == c[7] == 3
    assert c[0] == c[1] == 0


def test_wcc_scale8(scale8_path):
    from graph_tpu.io.graph500 import read_graph500

    src, dst, n = read_graph500(scale8_path)
    g = GraphBuilder().node_count(n).coo(src, dst).build_directed()
    res = wcc(g)
    c = res.components_np()
    assert len(c) == 256
    assert ((c >= 0) & (c < 256)).all()
    # cross-check against a host union-find
    parent = list(range(256))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in zip(src, dst):
        rs, rt = find(int(s)), find(int(t))
        if rs != rt:
            parent[rs] = rt
    roots = np.asarray([find(i) for i in range(256)])
    # identical partitions
    import itertools

    mapping = {}
    for ours, theirs in zip(c, roots):
        assert mapping.setdefault(int(ours), int(theirs)) == int(theirs)
    rmapping = {}
    for ours, theirs in zip(c, roots):
        assert rmapping.setdefault(int(theirs), int(ours)) == int(ours)


def test_wcc_variant_apis_agree():
    from graph_tpu import wcc_afforest, wcc_afforest_dss, wcc_baseline
    from graph_tpu import GraphBuilder

    g = GraphBuilder().edges([(0, 1), (1, 2), (3, 4)]).build_directed()
    base = wcc_baseline(g).components_np()
    assert np.array_equal(base, wcc_afforest(g).components_np())
    assert np.array_equal(base, wcc_afforest_dss(g).components_np())


def test_wcc_plan_int_labels_small():
    """The plan path carries int32 labels end to end (round 2) — no
    f32 2**24 cap; cross-check against the XLA path."""
    import jax.numpy as jnp

    from graph_tpu.algos.wcc import WccConfig, wcc
    from graph_tpu.engine import engine as eng_mod
    from graph_tpu.engine.engine import EdgeEngine
    from graph_tpu.graph.build import build_directed

    g = np.random.default_rng(17)
    n, m = 3000, 9000
    src = g.integers(0, n, m)
    dst = g.integers(0, n, m)
    graph = build_directed(jnp.asarray(src), jnp.asarray(dst), node_count=n)
    sym = EdgeEngine.build(np.concatenate([src, dst]),
                           np.concatenate([dst, src]), n, interpret=True)
    eng_mod._GRAPH_ENGINES[(id(graph), "sym")] = sym
    r_p = wcc(graph, WccConfig(engine="plan"))
    r_x = wcc(graph, WccConfig(engine="xla"))
    assert np.array_equal(np.asarray(r_p.components),
                          np.asarray(r_x.components))
