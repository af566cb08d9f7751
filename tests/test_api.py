"""API parity tests — mirrors the reference's Python binding test suite
(crates/mate/tests/*.py) behavior for graph_tpu.api."""

import numpy as np
import pytest

from graph_tpu.api import DiGraph, FileFormat, Graph, Layout

from conftest import resource


@pytest.fixture(scope="module")
def g(scale8_path) -> DiGraph:
    return DiGraph.load(scale8_path, layout=Layout.Sorted)


@pytest.fixture(scope="module")
def ug(scale8_path) -> Graph:
    return Graph.load(scale8_path, layout=Layout.Sorted)


@pytest.fixture(scope="module")
def el_g(test_el_path) -> DiGraph:
    return DiGraph.load(test_el_path, layout=Layout.Sorted, file_format=FileFormat.EdgeList)


@pytest.fixture(scope="module")
def el_ug(test_el_path) -> Graph:
    return Graph.load(test_el_path, layout=Layout.Sorted, file_format=FileFormat.EdgeList)


# -- graph_test.py analogs -------------------------------------------------


def test_load_graph(g):
    assert g.node_count() == 1 << 8
    assert g.edge_count() == 1 << 12


def test_to_undirected(g, ug):
    undirected = g.to_undirected()
    for n in range(undirected.node_count()):
        assert set(undirected.copy_neighbors(n)) == set(ug.copy_neighbors(n))


def test_to_undirected_with_layout():
    dg = DiGraph.from_numpy(
        np.array([[0, 1], [0, 1], [0, 2], [1, 2], [2, 1], [0, 3]], dtype=np.uint32)
    )
    u1 = dg.to_undirected()
    assert sorted(u1.copy_neighbors(0)) == [1, 1, 2, 3]
    assert sorted(u1.copy_neighbors(1)) == [0, 0, 2, 2]
    u2 = dg.to_undirected(Layout.Sorted)
    assert u2.copy_neighbors(0) == [1, 1, 2, 3]
    assert u2.copy_neighbors(1) == [0, 0, 2, 2]
    assert u2.copy_neighbors(2) == [0, 1, 1]
    assert u2.copy_neighbors(3) == [0]
    u3 = dg.to_undirected(Layout.Deduplicated)
    assert u3.copy_neighbors(0) == [1, 2, 3]
    assert u3.copy_neighbors(1) == [0, 2]
    assert u3.copy_neighbors(2) == [0, 1]
    assert u3.copy_neighbors(3) == [0]


def test_reorder(ug):
    degrees = sorted((ug.degree(n) for n in range(ug.node_count())), reverse=True)
    ug.make_degree_ordered()
    assert [ug.degree(n) for n in range(ug.node_count())] == degrees


# -- ds_test.py analogs ----------------------------------------------------


def test_numpy_graph():
    el = np.array([[0, 1], [2, 3], [4, 1]], dtype=np.uint32)
    gr = Graph.from_numpy(el, layout=Layout.Sorted)
    assert gr.node_count() == 5
    assert gr.edge_count() == 3
    assert np.array_equal(gr.neighbors(1), np.array([0, 4]))
    assert np.array_equal(gr.neighbors(3), np.array([2]))


def test_pandas_graph():
    import pandas as pd

    df = pd.DataFrame({"source": [0, 2, 4], "target": [1, 3, 1]})
    gr = Graph.from_pandas(df, layout=Layout.Sorted)
    assert gr.node_count() == 5
    assert np.array_equal(gr.neighbors(1), np.array([0, 4]))


def test_from_numpy_bad_shape():
    with pytest.raises(ValueError):
        Graph.from_numpy(np.zeros((3, 3), dtype=np.uint32))


# -- numpy_neighbors_test.py analogs ---------------------------------------


def test_out_neighbors_zero_copy(g):
    for n in range(0, g.node_count(), 17):
        nb = g.out_neighbors(n)
        assert len(nb) == g.out_degree(n)
        assert nb.base is not None  # a view, not a copy
        assert nb.tolist() == g.copy_out_neighbors(n)


def test_neighbors_not_writeable(g):
    nb = g.out_neighbors(0)
    with pytest.raises(ValueError):
        nb[0] = 1


def test_neighbors_keep_alive(scale8_path):
    gg = DiGraph.load(scale8_path, layout=Layout.Sorted)
    degree = gg.in_degree(82)
    nb = gg.in_neighbors(82)
    del gg
    assert len(nb) == degree
    assert np.all((nb >= 0) & (nb < (1 << 8)))


# -- graph_edgelist_test.py analogs -----------------------------------------


def test_load_edge_list(el_g):
    assert el_g.node_count() == 5
    assert el_g.edge_count() == 6
    assert np.array_equal(el_g.out_neighbors(0), [1, 2])
    assert np.array_equal(el_g.out_neighbors(1), [2, 3])
    assert np.array_equal(el_g.out_neighbors(2), [4])
    assert np.array_equal(el_g.out_neighbors(3), [4])
    assert np.array_equal(el_g.out_neighbors(4), [])


def test_load_undirected_edge_list(el_ug):
    assert el_ug.node_count() == 5
    assert el_ug.edge_count() == 6
    assert np.array_equal(el_ug.neighbors(1), [0, 2, 3])
    assert np.array_equal(el_ug.neighbors(4), [2, 3])


# -- page_rank_test.py analogs ----------------------------------------------


def test_page_rank(g):
    pr = g.page_rank()
    assert pr.ran_iterations >= 1
    assert pr.error < 1.0
    assert pr.micros > 0
    scores = pr.scores()
    assert len(scores) == 1 << 8
    assert (scores > 0.0).all()


def test_pr_max_iterations(g):
    assert g.page_rank(max_iterations=1).ran_iterations == 1


def test_pr_damping_factor(g):
    pr = g.page_rank(damping_factor=0)
    assert pr.ran_iterations == 1
    np.testing.assert_allclose(pr.scores(), 1 / (1 << 8))


def test_config_must_be_kwargs(g):
    with pytest.raises(TypeError):
        g.page_rank(42, 1.0, 0.1)
    with pytest.raises(TypeError):
        g.wcc(42, 1.0, 0.1)


# -- wcc_test.py analogs ----------------------------------------------------


def test_wcc(g):
    w = g.wcc()
    assert w.micros > 0
    components = w.components()
    assert len(components) == 1 << 8
    assert ((components >= 0) & (components < g.node_count())).all()


# -- triangle_count_test.py analogs ------------------------------------------


@pytest.mark.slow
def test_triangle_count_golden(scale8_path):
    # exact mate flow: Sorted fixture + make_degree_ordered (the shared
    # fixture mutation in the reference suite) -> 227,874
    u = Graph.load(scale8_path, layout=Layout.Sorted)
    u.make_degree_ordered()
    tc = u.global_triangle_count()
    assert tc.triangles == 227874
    assert tc.micros > 0


def test_tc_two_components_numpy():
    u = Graph.from_numpy(
        np.array(
            [[0, 1], [1, 2], [2, 0], [3, 4], [4, 5], [5, 3]], dtype=np.uint32
        ),
        layout=Layout.Deduplicated,
    )
    assert u.global_triangle_count().triangles == 2


# -- sssp (server-level parity; mate has no sssp) ----------------------------


def test_delta_stepping_api():
    d = DiGraph.load(resource("test.wel"), file_format=FileFormat.EdgeList)
    res = d.delta_stepping(start_node=0, delta=2.0)
    dist = res.distances()
    assert dist[0] == 0.0
    assert dist[1] == pytest.approx(0.1)
    assert dist[4] == pytest.approx(0.7)
