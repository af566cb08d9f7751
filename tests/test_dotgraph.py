"""DotGraph + label machinery tests — mirrors dotgraph.rs:534-625 exactly
on resources/test.graph."""

import numpy as np
import pytest

from graph_tpu import GraphBuilder
from graph_tpu.graph.build import build_undirected
from graph_tpu.graph.csr import CsrLayout
from graph_tpu.io.dotgraph import (
    DotGraphInput,
    LabelStats,
    NeighborLabelFrequencies,
    NodeLabelIndex,
    read_dotgraph,
)

from conftest import resource


@pytest.fixture(scope="module")
def dotgraph():
    return read_dotgraph(resource("test.graph"))


@pytest.fixture(scope="module")
def labeled_graph(dotgraph):
    return build_undirected(
        dotgraph.src,
        dotgraph.dst,
        node_count=dotgraph.node_count,
        layout=CsrLayout.SORTED,
        node_values=dotgraph.labels,
    )


def test_dotgraph_from_file(dotgraph):
    # dotgraph.rs:546-556
    assert len(dotgraph.labels) == 5
    assert len(dotgraph.src) == 6
    assert dotgraph.max_label == 2
    assert dotgraph.max_degree == 3


def test_max_label_frequency(dotgraph):
    assert dotgraph.max_label_frequency() == 2


def test_label_stats(labeled_graph):
    # dotgraph.rs:565-580
    stats = LabelStats.from_graph(labeled_graph)
    assert stats.max_degree == 3
    assert stats.max_label == 2
    assert stats.max_label_frequency == 2
    assert stats.label_frequency[0] == 1
    assert stats.label_frequency[1] == 2
    assert stats.label_frequency[2] == 2


def test_neighbor_label_frequency(labeled_graph):
    # dotgraph.rs:582-609
    nlf = NeighborLabelFrequencies(labeled_graph)
    assert nlf.neighbor_frequency(0).get(0) is None
    assert nlf.neighbor_frequency(0).get(1) == 1
    assert nlf.neighbor_frequency(0).get(2) == 1
    assert nlf.neighbor_frequency(1).get(0) == 1
    assert nlf.neighbor_frequency(1).get(1) == 1
    assert nlf.neighbor_frequency(1).get(2) == 1
    assert nlf.neighbor_frequency(4).get(0) is None
    assert nlf.neighbor_frequency(4).get(1) == 1
    assert nlf.neighbor_frequency(4).get(2) == 1


def test_node_label_index(labeled_graph):
    # dotgraph.rs:611-624
    stats = LabelStats.from_graph(labeled_graph)
    labels = np.asarray(labeled_graph.node_values)
    idx = NodeLabelIndex.from_stats(
        labeled_graph.node_count, stats, lambda v: int(labels[v])
    )
    assert idx.nodes(0).tolist() == [0]
    assert idx.nodes(1).tolist() == [1, 3]
    assert idx.nodes(2).tolist() == [2, 4]


def test_builder_with_dotgraph_input():
    g = (
        GraphBuilder()
        .file_format(DotGraphInput())
        .path(resource("test.graph"))
        .build_undirected()
    )
    assert g.node_count == 5
    assert g.edge_count == 6


def test_example_graph_n_lines():
    dg = read_dotgraph(resource("example.graph"))
    assert dg.node_count == 4
    assert len(dg.src) == 5
