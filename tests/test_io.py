"""Input pipeline tests (reference: builder/tests/builder.rs matrix +
resources fixtures, edgelist.rs/graph500.rs/gdl.rs)."""

import numpy as np
import pytest

from graph_tpu import GraphBuilder
from graph_tpu.io.edgelist import read_edge_list
from graph_tpu.io.graph500 import read_graph500
from graph_tpu.io.gdl import parse_gdl

from conftest import resource


def test_read_test_el(test_el_path):
    src, dst, values = read_edge_list(test_el_path)
    assert values is None
    assert src.tolist() == [0, 0, 1, 1, 2, 3]
    assert dst.tolist() == [1, 2, 2, 3, 4, 4]


def test_read_windows_crlf():
    # windows.el fixture content: "0 1\r\n0 2\r\n1 3\r\n"
    src, dst, _ = read_edge_list(resource("windows.el"))
    assert src.tolist() == [0, 0, 1]
    assert dst.tolist() == [1, 2, 3]


def test_read_weighted(test_wel_path):
    src, dst, values = read_edge_list(test_wel_path)
    assert values is not None
    np.testing.assert_allclose(values, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6], rtol=1e-6)


def test_graph500_scale8(scale8_path):
    src, dst, n = read_graph500(scale8_path)
    assert n == 256
    assert len(src) == 4096
    assert src.max() < 256 and dst.max() < 256


def test_builder_from_path(test_el_path):
    g = GraphBuilder().path(test_el_path).build_directed()
    assert g.node_count == 5
    assert g.edge_count == 6


def test_gdl_basic():
    src, dst, values, n = parse_gdl("(a)-->(b),(b)-->(c)")
    assert n == 3
    assert src.tolist() == [0, 1]
    assert dst.tolist() == [1, 2]
    assert values is None


def test_gdl_anonymous_and_back_arrow():
    src, dst, _, n = parse_gdl("(a)-->()-->()<--(a)")
    assert n == 3
    assert sorted(zip(src.tolist(), dst.tolist())) == [(0, 1), (0, 2), (1, 2)]


def test_gdl_weights_and_labels():
    src, dst, values, n = parse_gdl(
        "(a:A)(b:B)(a)-[{cost: 4.0}]->(b)"
    )
    assert n == 2
    assert values.tolist() == [4.0]


def test_gdl_node_values():
    from graph_tpu.io.gdl import _Parser, _tokenize

    p = _Parser(_tokenize("(a { value: 42 })-->(b { value: 7 })")).parse()
    assert p.node_values == {0: 42.0, 1: 7.0}


def test_dataset_loader_local_checksummed(tmp_path):
    """Path-based LDBC dataset loader (reference downloads these,
    benches/common/mod.rs:15-41; no network here): discovery, sha256
    sidecar verification, and the missing-dataset error message."""
    import hashlib

    import pytest

    from graph_tpu.errors import GraphError
    from graph_tpu.io.datasets import graph500_path, load_graph500

    root = tmp_path / "datasets"
    d = root / "graph-500-22"
    d.mkdir(parents=True)
    e = d / "graph500-22.e"
    e.write_text("0 1\n1 2\n2 0\n")
    # without checksum: loads
    assert graph500_path(22, str(root)) == str(e)
    g = load_graph500(22, str(root))
    assert g.node_count == 3 and g.edge_count == 3
    # good checksum passes, bad one raises
    good = hashlib.sha256(e.read_bytes()).hexdigest()
    (d / "graph500-22.e.sha256").write_text(good + "  graph500-22.e\n")
    assert graph500_path(22, str(root)) == str(e)
    (d / "graph500-22.e.sha256").write_text("deadbeef\n")
    with pytest.raises(GraphError, match="checksum mismatch"):
        graph500_path(22, str(root))
    with pytest.raises(GraphError, match="not found"):
        graph500_path(23, str(root))
