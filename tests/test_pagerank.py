"""PageRank correctness tests.

Golden sources:
* README wiki graph, 10 iterations, pinned floats (README.md:100-148,
  algos/src/lib.rs:92-141) — reproduced bit-exactly by the host
  reference model, and within tolerance at convergence by the device
  kernel.
* two-components GDL graph (page_rank.rs:175-197).
"""

import numpy as np
import pytest

from graph_tpu import GraphBuilder, PageRankConfig, page_rank
from graph_tpu.algos.pagerank import page_rank_reference

WIKI_EDGES = [
    (1, 2), (2, 1), (4, 0), (4, 1), (5, 4), (5, 1), (5, 6), (6, 1),
    (6, 5), (7, 1), (7, 5), (8, 1), (8, 5), (9, 1), (9, 5), (10, 1),
    (10, 5), (11, 5), (12, 5),
]

WIKI_EXPECTED = np.array(
    [
        0.024064068, 0.3145448, 0.27890152, 0.01153846, 0.029471997,
        0.06329483, 0.029471997, 0.01153846, 0.01153846, 0.01153846,
        0.01153846, 0.01153846, 0.01153846,
    ],
    dtype=np.float32,
)


def wiki_graph():
    return GraphBuilder().edges(WIKI_EDGES).build_directed()


def test_reference_model_matches_pinned_goldens_exactly():
    # Proves scheduling parity: the reference is sequential Gauss-Seidel
    # for < 16384-node graphs; our host model reproduces it bit-exactly.
    out_nbrs = [[] for _ in range(13)]
    for s, t in WIKI_EDGES:
        out_nbrs[s].append(t)
    scores, iters, _ = page_rank_reference(
        out_nbrs, 13, PageRankConfig(max_iterations=10)
    )
    assert iters == 10
    assert np.array_equal(scores, WIKI_EXPECTED)


def test_device_pagerank_converges_to_reference():
    g = wiki_graph()
    # Converged (not iteration-snapshotted) ranks agree within tolerance.
    res = page_rank(g, PageRankConfig(max_iterations=200, tolerance=1e-6))
    out_nbrs = [[] for _ in range(13)]
    for s, t in WIKI_EDGES:
        out_nbrs[s].append(t)
    ref, _, _ = page_rank_reference(
        out_nbrs, 13, PageRankConfig(max_iterations=200, tolerance=1e-6)
    )
    np.testing.assert_allclose(res.scores_np(), ref, atol=1e-4)
    assert res.error < 1e-6


def test_scores_sum_below_one_with_dangling():
    g = wiki_graph()
    res = page_rank(g)
    s = res.scores_np()
    assert (s > 0).all()
    assert s.sum() <= 1.0 + 1e-5


def test_two_components_converged():
    g = GraphBuilder().gdl("(a)-->()-->()<--(a),(b)-->()-->()<--(b)").build_directed()
    res = page_rank(g, PageRankConfig(max_iterations=300, tolerance=1e-7))
    s = res.scores_np()
    # symmetric components must produce identical scores
    np.testing.assert_allclose(s[:3], s[3:], rtol=0, atol=0)


def test_max_iterations_respected():
    g = wiki_graph()
    res = page_rank(g, PageRankConfig(max_iterations=1))
    assert res.ran_iterations == 1
    assert res.micros > 0


def test_tolerance_stops_early():
    # L1 delta per iteration is bounded by 2, so tolerance=3 must stop
    # after the first iteration (reference semantics: check after each
    # iteration, page_rank.rs:107).
    g = wiki_graph()
    res = page_rank(g, PageRankConfig(max_iterations=50, tolerance=3.0))
    assert res.ran_iterations == 1


def test_zero_damping_uniform():
    # mate test analog: damping_factor=0 → scores = 1/n after 1 iteration
    g = wiki_graph()
    res = page_rank(g, PageRankConfig(damping_factor=0.0))
    assert res.ran_iterations == 1
    np.testing.assert_allclose(res.scores_np(), np.full(13, 1 / 13, np.float32))


def test_pagerank_scale8(scale8_path):
    from graph_tpu.io.graph500 import read_graph500

    src, dst, n = read_graph500(scale8_path)
    g = GraphBuilder().node_count(n).coo(src, dst).build_directed()
    assert g.node_count == 256
    assert g.edge_count == 4096
    res = page_rank(g)
    s = res.scores_np()
    assert len(s) == 256
    assert (s > 0).all()
    assert res.ran_iterations >= 1


def test_plan_engine_recompiles_for_new_damping():
    """Regression: the compiled plan run must not bake in damping or
    tolerance (round-1 bug returned first-config scores for later
    configs that shared max_iterations)."""
    import jax.numpy as jnp

    from graph_tpu.engine import engine as eng_mod
    from graph_tpu.engine.engine import EdgeEngine
    from graph_tpu.graph.build import build_directed

    src = np.array([s for s, _ in WIKI_EDGES])
    dst = np.array([t for _, t in WIKI_EDGES])
    graph = build_directed(jnp.asarray(src), jnp.asarray(dst), node_count=13)
    eng = EdgeEngine.build(src, dst, 13, interpret=True)
    eng_mod._GRAPH_ENGINES[(id(graph), "fwd")] = eng

    r1 = page_rank(graph, PageRankConfig(damping_factor=0.85, engine="plan"))
    r2 = page_rank(graph, PageRankConfig(damping_factor=0.5, engine="plan"))
    r3 = page_rank(graph, PageRankConfig(damping_factor=0.85, engine="plan",
                                         tolerance=1e-1))
    assert not np.allclose(r1.scores_np(), r2.scores_np())
    assert r3.ran_iterations < r1.ran_iterations
    # and the 0.5-damping result actually matches an XLA run
    r2x = page_rank(graph, PageRankConfig(damping_factor=0.5, engine="cumsum"))
    np.testing.assert_allclose(r2.scores_np(), r2x.scores_np(), atol=1e-6)


def test_log_progress_matches_device_loop(caplog):
    """config.log_progress trades the device-resident loop for per-
    iteration logs (reference page_rank.rs:98-103) without changing
    the result."""
    import logging

    from graph_tpu import GraphBuilder, PageRankConfig, page_rank

    g = (GraphBuilder()
         .edges([(0, 1), (1, 2), (2, 0), (2, 1), (3, 2)])
         .build_directed())
    cfg = PageRankConfig(max_iterations=15, tolerance=1e-6)
    fast = page_rank(g, cfg)
    with caplog.at_level(logging.INFO, logger="graph_tpu.algos.pagerank"):
        logged = page_rank(g, PageRankConfig(max_iterations=15,
                                             tolerance=1e-6,
                                             log_progress=True))
    assert logged.ran_iterations == fast.ran_iterations
    np.testing.assert_array_equal(logged.scores_np(), fast.scores_np())
    lines = [r for r in caplog.records if "iteration" in r.message.lower()]
    assert len(lines) == logged.ran_iterations
