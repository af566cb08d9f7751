"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

This substitutes for the reference's thread+barrier concurrency tests
(SURVEY.md §4): sharded results must match single-device results.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_tpu import GraphBuilder, PageRankConfig, page_rank, wcc
from graph_tpu.generate import uniform_edge_list
from graph_tpu.graph.build import build_directed
from graph_tpu.parallel.mesh import make_mesh
from graph_tpu.parallel.pagerank import page_rank_sharded, shard_graph
from graph_tpu.parallel.wcc import shard_hook_graph, wcc_sharded


@pytest.fixture(scope="module")
def graph():
    src, dst = uniform_edge_list(500, 5000, seed=3)
    return build_directed(src, dst, node_count=500)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_pagerank_matches_single(graph, mesh):
    cfg = PageRankConfig(max_iterations=30, tolerance=1e-6)
    single = page_rank(graph, cfg)
    sg = shard_graph(graph, mesh)
    sharded = page_rank_sharded(sg, mesh, cfg)
    assert sharded.ran_iterations == single.ran_iterations
    np.testing.assert_allclose(
        sharded.scores_np(), single.scores_np(), atol=1e-6
    )


def test_sharded_pagerank_uneven_rows(mesh):
    # n=501 not divisible by 8: padding path
    src, dst = uniform_edge_list(501, 3000, seed=5)
    g = build_directed(src, dst, node_count=501)
    cfg = PageRankConfig(max_iterations=10, tolerance=0.0)
    single = page_rank(g, cfg)
    sharded = page_rank_sharded(shard_graph(g, mesh), mesh, cfg)
    np.testing.assert_allclose(sharded.scores_np(), single.scores_np(), atol=1e-6)


def test_sharded_wcc_matches_single(graph, mesh):
    single = wcc(graph)
    hg = shard_hook_graph(graph, mesh)
    sharded = wcc_sharded(hg, mesh)
    np.testing.assert_array_equal(
        sharded.components_np(), single.components_np()
    )


def test_sharded_wcc_two_components(mesh):
    g = GraphBuilder().edges([(0, 1), (2, 3)]).node_count(9).build_directed()
    hg = shard_hook_graph(g, mesh)
    res = wcc_sharded(hg, mesh)
    c = res.components_np()
    assert c[0] == c[1]
    assert c[2] == c[3]
    assert c[1] != c[2]


@pytest.mark.slow
def test_graft_entry_single_and_multi():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_halo_volume_below_all_gather():
    """Ragged halo must move fewer padded bytes than the all_gather it
    replaces on a partition-unfriendly random graph."""
    import jax

    from graph_tpu.graph.build import build_directed
    from graph_tpu.parallel.mesh import make_mesh
    from graph_tpu.parallel.pagerank import shard_graph

    n, m = 1 << 13, 1 << 15
    g = np.random.default_rng(9)
    src = g.integers(0, n, m)
    dst = g.integers(0, n, m)
    graph = build_directed(jnp.asarray(src), jnp.asarray(dst), node_count=n)
    mesh = make_mesh(8)
    sg = shard_graph(graph, mesh)
    assert sg.halo_bytes < sg.gather_bytes, (sg.halo_bytes, sg.gather_bytes)


def test_sssp_sharded_matches_single_device():
    from graph_tpu.algos.sssp import DeltaSteppingConfig, delta_stepping
    from graph_tpu.graph.build import build_directed
    from graph_tpu.parallel.mesh import make_mesh
    from graph_tpu.parallel.sssp import shard_weighted_graph, sssp_sharded

    n, m = 600, 4000
    g = np.random.default_rng(11)
    src = g.integers(0, n, m)
    dst = g.integers(0, n, m)
    w = (g.random(m) * 5).astype(np.float32)
    graph = build_directed(jnp.asarray(src), jnp.asarray(dst),
                           jnp.asarray(w), node_count=n)
    single = delta_stepping(graph, DeltaSteppingConfig(0, 2.0, engine="xla"))
    mesh = make_mesh(4)
    sg = shard_weighted_graph(graph, mesh)
    shard = sssp_sharded(sg, mesh, DeltaSteppingConfig(0, 2.0))
    assert np.array_equal(single.distances_np(), shard.distances_np())


def test_default_mesh_routes_algorithms():
    """page_rank()/wcc()/delta_stepping() must route through the sharded
    engines when a default mesh is installed, and bit-match."""
    from graph_tpu.algos.pagerank import PageRankConfig, page_rank
    from graph_tpu.algos.sssp import DeltaSteppingConfig, delta_stepping
    from graph_tpu.algos.wcc import wcc
    from graph_tpu.graph.build import build_directed
    from graph_tpu.parallel.mesh import make_mesh, use_mesh

    n, m = 500, 3000
    g = np.random.default_rng(13)
    src = g.integers(0, n, m)
    dst = g.integers(0, n, m)
    w = (g.random(m) * 3).astype(np.float32)
    graph = build_directed(jnp.asarray(src), jnp.asarray(dst),
                           jnp.asarray(w), node_count=n)
    pr0 = page_rank(graph, PageRankConfig(engine="cumsum"))
    wc0 = wcc(graph)
    ss0 = delta_stepping(graph, DeltaSteppingConfig(0, 2.0, engine="xla"))
    mesh = make_mesh(4)
    with use_mesh(mesh):
        pr1 = page_rank(graph)
        wc1 = wcc(graph)
        ss1 = delta_stepping(graph, DeltaSteppingConfig(0, 2.0))
    np.testing.assert_allclose(pr0.scores_np(), pr1.scores_np(), atol=2e-7)
    assert np.array_equal(np.asarray(wc0.components),
                          np.asarray(wc1.components))
    assert np.array_equal(ss0.distances_np(), ss1.distances_np())


def test_sharded_fns_are_memoized(graph, mesh):
    """A second meshed run must reuse the compiled callable instead of
    rebuilding the shard_map+jit object (remote compiles cost 20-60 s
    per shape on the real TPU tunnel)."""
    from graph_tpu.parallel import pagerank as pp
    from graph_tpu.parallel import sssp as ps
    from graph_tpu.parallel import wcc as pw

    cfg = PageRankConfig(max_iterations=5)
    sg = shard_graph(graph, mesh)
    page_rank_sharded(sg, mesh, cfg)  # ring path (the default)
    before = pp._pagerank_ring_fn.cache_info().hits
    page_rank_sharded(sg, mesh, cfg)
    assert pp._pagerank_ring_fn.cache_info().hits == before + 1
    page_rank_sharded(sg, mesh, cfg, ring=False)
    bb = pp._pagerank_sharded_fn.cache_info().hits
    page_rank_sharded(sg, mesh, cfg, ring=False)
    assert pp._pagerank_sharded_fn.cache_info().hits == bb + 1

    hg = shard_hook_graph(graph, mesh)
    wcc_sharded(hg, mesh)
    wb = pw._wcc_sharded_fn.cache_info().hits
    wcc_sharded(hg, mesh)
    assert pw._wcc_sharded_fn.cache_info().hits == wb + 1

    # SSSP additionally traces the start node: two sources, one entry
    from graph_tpu.algos.sssp import DeltaSteppingConfig, delta_stepping
    from graph_tpu.graph.build import build_directed

    rng = np.random.default_rng(5)
    n, m = 400, 2400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = (rng.random(m) * 3).astype(np.float32)
    wg = build_directed(jnp.asarray(src), jnp.asarray(dst),
                        jnp.asarray(w), node_count=n)
    swg = ps.shard_weighted_graph(wg, mesh)
    d0 = ps.sssp_sharded(swg, mesh, DeltaSteppingConfig(0, 2.0))
    sb = ps._sssp_sharded_fn.cache_info().hits
    d7 = ps.sssp_sharded(swg, mesh, DeltaSteppingConfig(7, 2.0))
    assert ps._sssp_sharded_fn.cache_info().hits == sb + 1
    r0 = delta_stepping(wg, DeltaSteppingConfig(0, 2.0))
    r7 = delta_stepping(wg, DeltaSteppingConfig(7, 2.0))
    assert np.array_equal(d0.distances_np(), r0.distances_np())
    assert np.array_equal(d7.distances_np(), r7.distances_np())


def test_engine_pin_skips_default_mesh(graph, mesh):
    """ADVICE round-2: an explicit engine= request must win over the
    installed default mesh instead of being silently overridden."""
    from graph_tpu.parallel import pagerank as pp
    from graph_tpu.parallel.mesh import use_mesh

    def boom(*a, **k):
        raise AssertionError("meshed path taken despite engine pin")

    orig = pp.page_rank_sharded
    pp.page_rank_sharded = boom
    try:
        with use_mesh(mesh):
            res = page_rank(graph, PageRankConfig(engine="cumsum",
                                                  max_iterations=5))
        assert res.ran_iterations == 5
        with use_mesh(mesh), pytest.raises(AssertionError, match="meshed"):
            page_rank(graph, PageRankConfig(max_iterations=5))
    finally:
        pp.page_rank_sharded = orig


def test_mesh_key_stable_across_objects(graph):
    """Equal meshes (same axes + devices) share the per-graph sharded
    cache even when the Mesh object identity differs (ADVICE round-2:
    id(mesh) could be reused by a different mesh after GC)."""
    from graph_tpu.parallel.mesh import make_mesh, mesh_key, use_mesh

    m1 = make_mesh(4)
    m2 = make_mesh(4)
    # (jax may intern equal meshes — the key must be stable either way)
    assert mesh_key(m1) == mesh_key(m2)
    from graph_tpu.engine.engine import _GRAPH_ENGINES

    with use_mesh(m1):
        page_rank(graph, PageRankConfig(max_iterations=3))
    n_entries = len(_GRAPH_ENGINES)
    with use_mesh(m2):
        page_rank(graph, PageRankConfig(max_iterations=3))
    assert len(_GRAPH_ENGINES) == n_entries  # reused, not re-sharded


def test_rowblock_pagerank_matches_single(graph, mesh):
    """The plan-kernel sharded path (RowBlockEdgeEngine behind the
    ragged halo) must agree with the single-device result; per-chip
    kernels are the same K1/K2 the unsharded engine runs."""
    from graph_tpu.parallel.pagerank import (
        page_rank_rowblock, shard_graph_plan)

    cfg = PageRankConfig(max_iterations=30, tolerance=1e-6)
    single = page_rank(graph, cfg)
    rbe = shard_graph_plan(graph, mesh, interpret=True)
    sharded = page_rank_rowblock(rbe, cfg)
    assert sharded.ran_iterations == single.ran_iterations
    np.testing.assert_allclose(
        sharded.scores_np(), single.scores_np(), atol=1e-6)
    # compiled run is cached per (engine, max_iterations)
    again = page_rank_rowblock(rbe, cfg)
    assert rbe._pr_runs and len(rbe._pr_runs) == 1
    np.testing.assert_array_equal(again.scores_np(), sharded.scores_np())


def test_rowblock_wcc_sssp_match_single(mesh):
    """WCC/SSSP on the row-block sharded EdgeEngine agree exactly with
    the single-device results (hooks/relaxations are per-chip K1/K2)."""
    from graph_tpu.algos.sssp import DeltaSteppingConfig, delta_stepping
    from graph_tpu.parallel.sssp import (
        shard_weighted_graph_plan, sssp_rowblock)
    from graph_tpu.parallel.wcc import shard_hook_graph_plan, wcc_rowblock

    rng = np.random.default_rng(21)
    n, m = 700, 4200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = (rng.random(m) * 4).astype(np.float32)
    g = build_directed(jnp.asarray(src), jnp.asarray(dst),
                       jnp.asarray(w), node_count=n)

    single_w = wcc(g)
    rbe = shard_hook_graph_plan(g, mesh, interpret=True)
    sharded_w = wcc_rowblock(rbe)
    np.testing.assert_array_equal(sharded_w.components_np(),
                                  single_w.components_np())

    single_s = delta_stepping(g, DeltaSteppingConfig(0, 2.0, engine="xla"))
    srbe = shard_weighted_graph_plan(g, mesh, interpret=True)
    sharded_s = sssp_rowblock(srbe, DeltaSteppingConfig(0, 2.0))
    np.testing.assert_array_equal(sharded_s.distances_np(),
                                  single_s.distances_np())


def test_ring_halo_bitmatches_blocking_exchange(graph, mesh):
    """The ppermute-ring halo (overlapped, per-owner-group partial
    sums in int32 quanta) must match the blocking all_to_all path bit
    for bit, and both match the single-device result."""
    from graph_tpu.parallel.pagerank import page_rank_sharded, shard_graph

    cfg = PageRankConfig(max_iterations=12, tolerance=1e-7)
    sg = shard_graph(graph, mesh)
    assert sg.ring_targets is not None
    ring = page_rank_sharded(sg, mesh, cfg, ring=True)
    blocking = page_rank_sharded(sg, mesh, cfg, ring=False)
    np.testing.assert_array_equal(ring.scores_np(), blocking.scores_np())
    assert ring.ran_iterations == blocking.ran_iterations
    single = page_rank(graph, cfg)
    np.testing.assert_allclose(ring.scores_np(), single.scores_np(),
                               atol=1e-6)


def test_wcc_jump_every_matches(graph, mesh):
    """Amortized pointer jumping (jump_every=3) converges to the same
    components as every-round jumping — the jump is an accelerator,
    not a correctness requirement (VERDICT round-2 weak #7)."""
    from graph_tpu.parallel.wcc import (
        shard_hook_graph_plan, wcc_rowblock)

    hg = shard_hook_graph(graph, mesh)
    every = wcc_sharded(hg, mesh)
    amortized = wcc_sharded(hg, mesh, jump_every=3)
    np.testing.assert_array_equal(amortized.components_np(),
                                  every.components_np())
    assert amortized.ran_iterations >= every.ran_iterations

    rbe = shard_hook_graph_plan(graph, mesh, interpret=True)
    rb = wcc_rowblock(rbe, jump_every=3)
    np.testing.assert_array_equal(rb.components_np(),
                                  every.components_np())


@pytest.mark.slow
def test_sharded_triangle_count_matches_single(mesh):
    """Wedge-partitioned TC over the mesh == single-device counts,
    including the scale-8 SORTED multiset golden 227,874
    (crates/mate/tests/triangle_count_test.py:5-9)."""
    from conftest import resource

    from graph_tpu import CsrLayout, global_triangle_count
    from graph_tpu.io.graph500 import Graph500Input
    from graph_tpu.graph.ops import make_degree_ordered
    from graph_tpu.parallel.tc import triangle_count_sharded

    ug = (GraphBuilder().csr_layout(CsrLayout.SORTED)
          .file_format(Graph500Input())
          .path(resource("scale_8.graph500")).build_undirected())
    g_sorted = make_degree_ordered(ug)
    r = triangle_count_sharded(g_sorted, mesh)
    assert r.triangles == 227874

    ug2 = (GraphBuilder().csr_layout(CsrLayout.DEDUPLICATED)
           .file_format(Graph500Input())
           .path(resource("scale_8.graph500")).build_undirected())
    single = global_triangle_count(ug2).triangles
    sharded = triangle_count_sharded(ug2, mesh).triangles
    assert sharded == single

    # default-mesh routing: global_triangle_count inside use_mesh
    from graph_tpu.parallel.mesh import use_mesh

    with use_mesh(mesh):
        assert global_triangle_count(ug2).triangles == single
