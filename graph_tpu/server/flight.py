"""Arrow Flight gRPC service.

Reference analog: ``FlightServiceImpl`` (crates/server/src/server.rs:
34-576) on ``[::1]:50051`` (main.rs:40-56):

* ``do_action``  — JSON actions: create / list / remove / compute /
  to_relabeled / to_undirected (dispatch at server.rs:187-258),
* ``do_put``     — stream an Int64 (source, target) edge list plus a
  ``CreateGraphCommand`` descriptor to build a named graph
  (server.rs:109-177),
* ``do_get``     — stream an algorithm-result property column back as
  record batches of 10,000 rows (server.rs:70-107),
* ``list_actions`` — advertised action types.

Implemented on pyarrow.flight; compute runs inline (the JAX dispatch is
itself asynchronous — the analog of the reference's spawn_blocking).
"""

from __future__ import annotations

import json
import logging
import time

import numpy as np
import pyarrow as pa
import pyarrow.flight as flight

from graph_tpu.errors import GraphError, GraphNotFound
from graph_tpu.server import actions as act
from graph_tpu.server.catalog import GraphCatalog, PropertyStore

log = logging.getLogger("graph_tpu.server")


class GraphFlightServer(flight.FlightServerBase):
    def __init__(self, location="grpc://[::1]:50051", **kwargs):
        super().__init__(location, **kwargs)
        self._location = location
        self.catalog = GraphCatalog()
        self.properties = PropertyStore()

    # -- actions -----------------------------------------------------------

    def list_actions(self, context):
        return [flight.ActionType(t, d) for t, d in act.ACTION_TYPES]

    def do_action(self, context, action):
        log.info("Received action %r", action.type)
        try:
            handler = {
                "create": self._create,
                "list": self._list,
                "remove": self._remove,
                "compute": self._compute,
                "to_relabeled": self._to_relabeled,
                "to_undirected": self._to_undirected,
            }[action.type]
        except KeyError:
            raise flight.FlightServerError(f"Unknown action type: {action.type}")
        try:
            result = handler(action.body.to_pybytes())
        except (GraphError, act.ProtocolError, KeyError, FileNotFoundError) as e:
            raise flight.FlightServerError(str(e))
        return [act.to_json(result)]

    def _create(self, body: bytes):
        cfg = act.CreateGraphFromFileConfig.from_json(body)
        from graph_tpu.builder import GraphBuilder
        from graph_tpu.graph.csr import DirectedCsrGraph, UndirectedCsrGraph
        from graph_tpu.io.edgelist import EdgeListInput
        from graph_tpu.io.graph500 import Graph500Input

        fmt = {
            "EdgeList": lambda: EdgeListInput(weighted=False),
            "EdgeListWeighted": lambda: EdgeListInput(weighted=True),
            "Graph500": Graph500Input,
        }[cfg.file_format]()
        t0 = time.perf_counter()
        builder = (
            GraphBuilder().csr_layout(cfg.csr_layout).file_format(fmt).path(cfg.path)
        )
        target = (
            UndirectedCsrGraph if cfg.orientation == "Undirected" else DirectedCsrGraph
        )
        g = builder.build(target)
        self.catalog.insert(cfg.graph_name, g)
        millis = int((time.perf_counter() - t0) * 1e3)
        log.info("Created graph '%s' in %dms", cfg.graph_name, millis)
        return {
            "node_count": g.node_count,
            "edge_count": g.edge_count,
            "create_millis": millis,
        }

    def _list(self, body: bytes):
        return {
            "graph_infos": [
                {
                    "graph_name": name,
                    "graph_type": gtype,
                    "node_count": n,
                    "edge_count": m,
                }
                for name, gtype, n, m in self.catalog.list()
            ]
        }

    def _remove(self, body: bytes):
        name = json.loads(body)["graph_name"]
        rname, gtype, n, m = self.catalog.remove(name)
        # The reference returns the removed graph's GraphInfo
        # (server.rs:333-339, catalog.rs:191-205) so clients can confirm
        # what was dropped.
        return {
            "graph_name": rname,
            "graph_type": gtype,
            "node_count": n,
            "edge_count": m,
        }

    def _to_relabeled(self, body: bytes):
        from graph_tpu.graph.ops import make_degree_ordered

        name = json.loads(body)["graph_name"]
        g = self.catalog.get(name)
        t0 = time.perf_counter()
        self.catalog.insert(name, make_degree_ordered(g))
        return {"to_relabeled_millis": int((time.perf_counter() - t0) * 1e3)}

    def _to_undirected(self, body: bytes):
        from graph_tpu.graph.ops import to_undirected

        d = json.loads(body)
        g = self.catalog.get(d["graph_name"])
        layout = act.parse_layout(d.get("csr_layout"))
        t0 = time.perf_counter()
        self.catalog.insert(d["graph_name"], to_undirected(g, layout))
        return {"to_undirected_millis": int((time.perf_counter() - t0) * 1e3)}

    def _compute(self, body: bytes):
        cfg = act.ComputeConfig.from_json(body)
        g = self.catalog.get(cfg.graph_name)
        pid = act.property_id(cfg.graph_name, cfg.property_key)
        t0 = time.perf_counter()

        if cfg.algorithm_name == "PageRank":
            from graph_tpu.algos.pagerank import page_rank

            res = page_rank(g, cfg.page_rank_config())
            self.properties.insert(
                cfg.graph_name, cfg.property_key, "page_rank",
                res.scores_np().astype(np.float32),
            )
            algo_result = {
                "iterations": res.ran_iterations,
                "error": res.error,
                "compute_millis": int((time.perf_counter() - t0) * 1e3),
            }
        elif cfg.algorithm_name == "Wcc":
            from graph_tpu.algos.wcc import wcc

            res = wcc(g, cfg.wcc_config())
            self.properties.insert(
                cfg.graph_name, cfg.property_key, "component",
                res.components_np().astype(np.uint64),
            )
            algo_result = {"compute_millis": int((time.perf_counter() - t0) * 1e3)}
        elif cfg.algorithm_name == "Sssp":
            from graph_tpu.algos.sssp import delta_stepping

            res = delta_stepping(g, cfg.sssp_config())
            self.properties.insert(
                cfg.graph_name, cfg.property_key, "distance",
                res.distances_np().astype(np.float32),
            )
            algo_result = {"compute_millis": int((time.perf_counter() - t0) * 1e3)}
        elif cfg.algorithm_name == "TriangleCount":
            from graph_tpu.algos.triangle_count import global_triangle_count

            res = global_triangle_count(g)
            self.properties.insert(
                cfg.graph_name, cfg.property_key, "triangle_count",
                np.asarray([res.triangles], dtype=np.uint64),
            )
            algo_result = {
                "triangle_count": res.triangles,
                "compute_millis": int((time.perf_counter() - t0) * 1e3),
            }
        else:
            raise act.ProtocolError(f"unknown algorithm {cfg.algorithm_name!r}")

        return {"property_id": pid, "algo_result": algo_result}

    # -- data plane ---------------------------------------------------------

    def do_put(self, context, descriptor, reader, writer):
        cmd = act.CreateGraphCommand.from_json(descriptor.command)
        log.info("Received PUT request with command: %s", cmd)
        from graph_tpu.graph.build import build_directed, build_undirected

        t0 = time.perf_counter()
        # Ingest record batches incrementally (server.rs:109-177 streams
        # batches into the edge list as they arrive): each batch is
        # converted to numpy and released before the next is read, so
        # peak memory is the edge arrays, not the Arrow table + arrays.
        src_chunks, dst_chunks = [], []
        for chunk in reader:
            batch = chunk.data
            src_chunks.append(
                batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64))
            dst_chunks.append(
                batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64))
        src = (np.concatenate(src_chunks) if src_chunks
               else np.zeros(0, np.int64))
        dst = (np.concatenate(dst_chunks) if dst_chunks
               else np.zeros(0, np.int64))
        build = build_undirected if cmd.orientation == "Undirected" else build_directed
        g = build(src, dst, layout=cmd.csr_layout)
        self.catalog.insert(cmd.graph_name, g)
        result = {
            "node_count": g.node_count,
            "edge_count": g.edge_count,
            "create_millis": int((time.perf_counter() - t0) * 1e3),
        }
        log.info("Created graph '%s': %s", cmd.graph_name, result)
        writer.write(act.to_json(result))

    def do_get(self, context, ticket):
        pid = json.loads(ticket.ticket)
        log.info("Received GET request for ticket: %s", pid)
        batches = self.properties.get(pid["graph_name"], pid["property_key"])
        table = pa.Table.from_batches(batches)
        return flight.RecordBatchStream(table)


def serve(location="grpc://[::1]:50051"):
    """main.rs:25-62 analog."""
    logging.basicConfig(level=logging.INFO)
    server = GraphFlightServer(location)
    log.info("Serving on %s", location)
    server.serve()


if __name__ == "__main__":
    serve()
