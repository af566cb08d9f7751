"""Out-of-core engine tests: slab-streamed spmv and PageRank.

The slabs are forced small so a graph that would comfortably fit
device memory exercises the >1-slab streaming path; results must be
BIT-exact vs the resident single-plan engine (same kernels, disjoint
destination rows).
"""

import numpy as np
import pytest


def _graph(n=150_000, m=600_000, seed=5):
    r = np.random.default_rng(seed)
    return (r.integers(0, n, m).astype(np.int64),
            r.integers(0, n, m).astype(np.int64), n)


def test_ooc_spmv_bitexact_vs_resident():
    import jax.numpy as jnp

    from graph_tpu.engine.engine import EdgeEngine
    from graph_tpu.engine.ooc import OocEdgeEngine

    src, dst, n = _graph()
    ooc = OocEdgeEngine.build(src, dst, n, n_slabs=3, interpret=True)
    assert len(ooc.slabs) >= 2, "test must exercise multiple slabs"
    ref = EdgeEngine.build(src, dst, n, interpret=True)
    r = np.random.default_rng(1)
    x = (r.random(n) * 1e-5).astype(np.float32)
    y_ooc = ooc.spmv(x)
    y_ref = np.asarray(ref.spmv(jnp.asarray(x)))
    np.testing.assert_array_equal(y_ooc, y_ref)


def test_ooc_max_bytes_budget_partitions():
    from graph_tpu.engine.ooc import OocEdgeEngine, _BYTES_PER_SLOT

    src, dst, n = _graph(n=140_000, m=400_000, seed=9)
    # ~400k slots * 12.3 B ~ 5 MB; a 2 MB budget must split
    ooc = OocEdgeEngine.build(src, dst, n, max_bytes=2 << 20,
                              interpret=True)
    assert len(ooc.slabs) >= 2
    for sl in ooc.slabs:
        # mid-aligned, disjoint, covering
        assert sl.d0 % 65536 == 0
    covered = sorted((sl.d0, sl.d0 + sl.rows) for sl in ooc.slabs)
    assert covered[0][0] == 0 and covered[-1][1] >= n - 65536
    for (a0, a1), (b0, b1) in zip(covered, covered[1:]):
        assert a1 == b0


def test_ooc_pagerank_matches_host_model():
    from graph_tpu.engine.ooc import page_rank_ooc

    src, dst, n = _graph(n=100_000, m=400_000, seed=13)
    scores, it, err = page_rank_ooc(src, dst, n, max_iterations=8,
                                    tolerance=0.0, n_slabs=2,
                                    interpret=True)
    # host Jacobi model (float64 accumulate, tolerance comparison —
    # the reference's page_rank tolerance semantics, page_rank.rs:45-47)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    inv = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1.0), 0.0)
    s = np.full(n, 1.0 / n)
    for _ in range(8):
        out = s * inv
        acc = np.zeros(n)
        np.add.at(acc, dst, out[src])
        s = (1 - 0.85) / n + 0.85 * acc
    np.testing.assert_allclose(scores, s, atol=5e-6)
    # dangling nodes drop mass in this formulation (same as the
    # resident engine); sums must agree with the model, not with 1.0
    np.testing.assert_allclose(scores.sum(), s.sum(), atol=1e-4)
    assert it == 8


def test_ooc_wcc_matches_host_model():
    from graph_tpu.engine.ooc import wcc_ooc

    # several components: disjoint rings plus random chords inside them
    r = np.random.default_rng(17)
    n = 120_000
    parts = 4
    size = n // parts
    src_l, dst_l = [], []
    for p in range(parts):
        base = p * size
        ids = np.arange(base, base + size)
        src_l += [ids, ids]
        dst_l += [np.roll(ids, 1), base + r.integers(0, size, size)]
    src = np.concatenate(src_l).astype(np.int64)
    dst = np.concatenate(dst_l).astype(np.int64)
    comp = wcc_ooc(src, dst, n, n_slabs=2, interpret=True)
    # every node's label == its partition's min node id
    expected = (np.arange(n) // size) * size
    np.testing.assert_array_equal(comp, expected)


def test_ooc_sssp_matches_host_model():
    from graph_tpu.engine.ooc import sssp_ooc

    r = np.random.default_rng(23)
    n, m = 100_000, 400_000
    src = r.integers(0, n, m).astype(np.int64)
    dst = r.integers(0, n, m).astype(np.int64)
    w = (r.random(m) * 4).astype(np.float32)
    dist = sssp_ooc(src, dst, w, n, n_slabs=2, interpret=True)
    # host Bellman-Ford (float32 adds to match the kernel arithmetic)
    exp = np.full(n, np.float32(3.0e38), np.float32)
    exp[0] = 0.0
    while True:
        cand = (exp[src] + w).astype(np.float32)
        new = exp.copy()
        np.minimum.at(new, dst, cand)
        if np.array_equal(new, exp):
            break
        exp = new
    np.testing.assert_array_equal(dist, exp)
