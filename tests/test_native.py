"""Native C++ edge-list parser tests (vs the pandas fallback)."""

import numpy as np
import pytest

from graph_tpu.native import edge_list_parser
from graph_tpu.io.edgelist import _parse_pandas

from conftest import resource


@pytest.fixture(scope="module")
def native_available():
    if edge_list_parser._load() is None:
        pytest.skip("no native toolchain available")


def test_native_matches_pandas_el(native_available, test_el_path):
    ns, nd, nv = edge_list_parser.parse(test_el_path, False)
    ps, pd_, pv = _parse_pandas(test_el_path, False)
    assert np.array_equal(ns, ps)
    assert np.array_equal(nd, pd_)
    assert nv is None and pv is None


def test_native_weighted(native_available, test_wel_path):
    ns, nd, nv = edge_list_parser.parse(test_wel_path, True)
    np.testing.assert_allclose(nv, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6], rtol=1e-6)
    assert ns.tolist() == [0, 0, 1, 1, 2, 3]


def test_native_crlf(native_available):
    ns, nd, _ = edge_list_parser.parse(resource("windows.el"), False)
    assert ns.tolist() == [0, 0, 1]
    assert nd.tolist() == [1, 2, 3]


def test_native_missing_file(native_available):
    with pytest.raises(FileNotFoundError):
        edge_list_parser.parse("/nonexistent/file.el", False)


def test_native_large_roundtrip(native_available, tmp_path):
    rng = np.random.default_rng(0)
    m = 200_000
    src = rng.integers(0, 1 << 20, m)
    dst = rng.integers(0, 1 << 20, m)
    p = tmp_path / "big.el"
    with open(p, "w") as f:
        for s, t in zip(src.tolist(), dst.tolist()):
            f.write(f"{s} {t}\n")
    ns, nd, _ = edge_list_parser.parse(str(p), False)
    assert np.array_equal(ns, src)
    assert np.array_equal(nd, dst)


def test_host_csr_native_matches_numpy():
    """The C++ radix host builder and TC orientation must match the
    numpy fallbacks exactly (same sort stability, dedup, ranks)."""
    import numpy as np

    from graph_tpu.native.host_csr import (
        build_undirected_native, tc_orient_native)

    rng = np.random.default_rng(41)
    n, m = 700, 6000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)

    nat = build_undirected_native(src, dst, w, n, 2)  # DEDUPLICATED
    assert nat is not None
    offsets, rows, cols, vals = nat
    # numpy model
    r2 = np.concatenate([src, dst])
    c2 = np.concatenate([dst, src])
    v2 = np.concatenate([w, w])
    o = np.lexsort((c2, r2))
    r2, c2, v2 = r2[o], c2[o], v2[o]
    keep = np.ones(r2.size, bool)
    keep[1:] = ~((r2[1:] == r2[:-1]) & (c2[1:] == c2[:-1]))
    keep &= r2 != c2
    np.testing.assert_array_equal(rows, r2[keep])
    np.testing.assert_array_equal(cols, c2[keep])
    np.testing.assert_array_equal(vals, v2[keep])
    np.testing.assert_array_equal(
        offsets, np.searchsorted(r2[keep], np.arange(n + 1)))

    # orientation parity (rank by (degree, id), forward filter, sort)
    srcs, tgts = r2[keep].astype(np.int32), c2[keep].astype(np.int32)
    a_n, b_n = tc_orient_native(srcs, tgts, n)
    deg = np.bincount(srcs, minlength=n)
    order = np.argsort(deg, kind="stable")
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    a = rank[srcs]
    b = rank[tgts]
    fwd = a < b
    a, b = a[fwd], b[fwd]
    oo = np.lexsort((b, a))
    np.testing.assert_array_equal(a_n, a[oo])
    np.testing.assert_array_equal(b_n, b[oo])


def test_native_layout_parity_with_python():
    """The C++ layout builder (the build_plan default) must make the
    same auto-pick and produce the same spmv as the python path —
    including the (16384, 16) wide-slice candidate added in round 3."""
    import jax.numpy as jnp
    import numpy as np

    from graph_tpu.engine.engine import EdgeEngine
    from graph_tpu.engine.native_route import build_layout_native
    from graph_tpu.engine.plan import build_plan
    from graph_tpu.engine.route import clos_route

    if build_layout_native(np.zeros(1, np.int64), np.zeros(1, np.int64),
                           n=1) is None:
        import pytest

        pytest.skip("native layout unavailable")
    rng = np.random.default_rng(17)
    n, m = 1 << 17, 1 << 16
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    p_nat = build_plan(src, dst, n)             # native default
    p_py = build_plan(src, dst, n, colorer=clos_route)
    assert (p_nat.win, p_nat.nslices) == (p_py.win, p_py.nslices)
    assert p_nat.nslots == p_py.nslots
    assert p_nat.ws.dtype == p_py.ws.dtype
    x = (rng.random(n) * 1e-5).astype(np.float32)
    y_nat = np.asarray(EdgeEngine(p_nat, interpret=True).spmv(jnp.asarray(x)))
    y_py = np.asarray(EdgeEngine(p_py, interpret=True).spmv(jnp.asarray(x)))
    np.testing.assert_array_equal(y_nat, y_py)
