"""Binary snapshot roundtrip tests (reference: csr.rs:969-1255 serialize
roundtrips incl. wrong-id-type error; app/src/serialize.rs:45-69)."""

import numpy as np
import pytest

from graph_tpu import GraphBuilder, InvalidIdType, build_undirected
from graph_tpu.graph.csr import CsrLayout
from graph_tpu.io.binary import load_graph, save_graph


def test_directed_roundtrip(tmp_path):
    g = GraphBuilder().edges([(0, 1), (0, 2), (1, 2)]).build_directed()
    p = str(tmp_path / "g.bin")
    save_graph(p, g)
    g2 = load_graph(p)
    assert g2.node_count == g.node_count
    assert g2.edge_count == g.edge_count
    assert np.array_equal(np.asarray(g2.csr_out.offsets), np.asarray(g.csr_out.offsets))
    assert np.array_equal(np.asarray(g2.csr_out.targets), np.asarray(g.csr_out.targets))
    assert np.array_equal(np.asarray(g2.csr_in.targets), np.asarray(g.csr_in.targets))
    assert np.array_equal(np.asarray(g2.csr_out.sources), np.asarray(g.csr_out.sources))


def test_weighted_roundtrip(tmp_path):
    g = (
        GraphBuilder()
        .csr_layout(CsrLayout.SORTED)
        .edges_with_values([(0, 1, 0.25), (1, 0, 1.5)])
        .build_directed()
    )
    p = str(tmp_path / "g.bin")
    save_graph(p, g)
    g2 = load_graph(p)
    assert np.array_equal(np.asarray(g2.csr_out.values), np.asarray(g.csr_out.values))
    assert g2.layout == CsrLayout.SORTED


def test_undirected_roundtrip(tmp_path):
    g = build_undirected([0, 1], [1, 2], layout=CsrLayout.DEDUPLICATED)
    p = str(tmp_path / "g.bin")
    save_graph(p, g)
    g2 = load_graph(p)
    assert g2.edge_count == 2
    assert g2.layout == CsrLayout.DEDUPLICATED


def test_wrong_id_type_raises(tmp_path):
    # reference: Error::InvalidIdType (csr.rs:285-290)
    g = GraphBuilder().edges([(0, 1)]).build_directed()
    p = str(tmp_path / "g.bin")
    save_graph(p, g)
    with pytest.raises(InvalidIdType):
        load_graph(p, id_dtype=np.int64)


def test_el_to_binary_roundtrip(tmp_path, test_el_path):
    # app serialize subcommand analog (app/src/serialize.rs:45-69)
    g = GraphBuilder().path(test_el_path).build_directed()
    p = str(tmp_path / "snap.bin")
    save_graph(p, g)
    g2 = load_graph(p)
    assert np.array_equal(
        np.asarray(g2.csr_out.targets), np.asarray(g.csr_out.targets)
    )


def test_binary_input_plugs_into_builder(tmp_path):
    """Reference parity: BinaryInput as a builder file_format
    (crates/builder/src/input/binary.rs:13-38)."""
    import numpy as np
    import pytest

    from graph_tpu import GraphBuilder, InvalidIdType
    from graph_tpu.errors import GraphError
    from graph_tpu.io.binary import BinaryInput, save_graph

    g = GraphBuilder().edges([(0, 1), (1, 2), (2, 0), (0, 2)]).build_directed()
    path = str(tmp_path / "g.bin")
    save_graph(path, g)

    g2 = (GraphBuilder().file_format(BinaryInput()).path(path)
          .build_directed())
    assert g2.node_count == g.node_count
    assert g2.edge_count == g.edge_count
    assert np.array_equal(np.asarray(g2.csr_out.targets),
                          np.asarray(g.csr_out.targets))
    # id-dtype mismatch raises like csr.rs:285-290
    with pytest.raises(InvalidIdType):
        GraphBuilder().file_format(BinaryInput(np.int64)).path(path)
    # wrong graph kind errors
    with pytest.raises(GraphError):
        (GraphBuilder().file_format(BinaryInput()).path(path)
         .build_undirected())
