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
