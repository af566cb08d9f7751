"""Mutable adjacency-list graph tests (reference: adj_list.rs:895-1065)."""

import numpy as np
import pytest

from graph_tpu.errors import GraphError
from graph_tpu.graph.adj import DirectedALGraph, MissingNode, UndirectedALGraph
from graph_tpu.graph.csr import CsrLayout


def test_add_edges_and_snapshot():
    g = DirectedALGraph(3)
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    g.add_edge(1, 2)
    assert g.edge_count == 3
    assert g.neighbors(0).tolist() == [1, 2]
    snap = g.snapshot()
    assert snap.node_count == 3


def test_missing_node_raises():
    g = DirectedALGraph(2)
    with pytest.raises(MissingNode):
        g.add_edge(0, 5)
    with pytest.raises(MissingNode):
        g.add_edge(7, 0)


def test_snapshot_invalidated_on_mutation():
    g = DirectedALGraph(3, edges=[(0, 1)])
    s1 = g.snapshot()
    g.add_edge(1, 2)
    s2 = g.snapshot()
    assert s1 is not s2
    assert s2.edge_count == 2
    assert g.snapshot() is s2  # cached


def test_sorted_layout_applied():
    g = DirectedALGraph(4, layout=CsrLayout.SORTED)
    g.add_edge(0, 3)
    g.add_edge(0, 1)
    g.add_edge(0, 2)
    assert g.neighbors(0).tolist() == [1, 2, 3]


def test_undirected_degrees():
    g = UndirectedALGraph(3, edges=[(0, 1), (1, 2)])
    assert g.degrees().tolist() == [1, 2, 1]
    assert g.snapshot().edge_count == 2


def test_weighted_mutation():
    g = DirectedALGraph(2)
    g.add_edge_with_value(0, 1, 0.5)
    snap = g.snapshot()
    assert np.asarray(snap.csr_out.values).tolist() == [0.5]
    with pytest.raises(GraphError):
        g.add_edge(1, 0)  # unweighted insert into weighted graph


def test_algorithms_run_on_snapshot():
    from graph_tpu import page_rank, wcc

    g = DirectedALGraph(4, edges=[(0, 1), (2, 3)])
    res = wcc(g.snapshot())
    assert res.component(0) == res.component(1)
    assert res.component(2) != res.component(1)
    pr = page_rank(g.snapshot())
    assert pr.scores_np().shape == (4,)


def test_parallel_mutation_is_safe():
    # reference: parallel insertion tests adj_list.rs:895-910 — two
    # threads adding edges concurrently must not misalign src/dst pairs
    import threading

    g = DirectedALGraph(64)
    per_thread = 2000
    barrier = threading.Barrier(2)

    def adder(base):
        barrier.wait()
        for i in range(per_thread):
            g.add_edge(base, (base + i) % 64)

    threads = [threading.Thread(target=adder, args=(b,)) for b in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert g.edge_count == 2 * per_thread
    # src identifies the inserting thread, so the dst multiset per src
    # must match what that thread inserted — an interleaved append
    # would pair one thread's src with the other's dst
    src = np.asarray(g._src)
    dst = np.asarray(g._dst)
    for b in (1, 2):
        assert src[src == b].size == per_thread
        got = np.sort(dst[src == b])
        want = np.sort((b + np.arange(per_thread)) % 64)
        np.testing.assert_array_equal(got, want)
