"""Shared helpers for the Flight client examples.

Start the server first:  ``python -m graph_tpu.server``  (listens on
grpc://localhost:50051 like the reference server, main.rs:40-56).

Each example generates its own tiny input file by default, so they run
out of the box; pass ``--path FILE --format {EdgeList,EdgeListWeighted,
Graph500}`` to use a real dataset (reference bar: the pyarrow demos in
crates/server/examples/).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np
import pyarrow.flight as flight


def parse_args(description: str, weighted: bool = False):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--location", default="grpc://localhost:50051",
                   help="Flight server location")
    p.add_argument("--path", default=None,
                   help="graph file (default: generate a tiny RMAT)")
    p.add_argument("--format", default=None,
                   choices=["EdgeList", "EdgeListWeighted", "Graph500"],
                   help="file format of --path")
    args = p.parse_args()
    if args.path is None:
        args.path = _tiny_graph(weighted)
        args.format = "EdgeListWeighted" if weighted else "EdgeList"
    elif args.format is None:
        args.format = ("EdgeListWeighted" if args.path.endswith(".wel")
                       else "Graph500" if args.path.endswith(".graph500")
                       else "EdgeList")
    return args


def _tiny_graph(weighted: bool, scale: int = 10, ef: int = 8) -> str:
    """Write a small RMAT edge list to a temp file and return its path."""
    rng = np.random.default_rng(42)
    n, m = 1 << scale, ef << scale
    src = np.zeros(m, np.int64)
    dst = np.zeros(m, np.int64)
    for b in range(scale):
        r1, r2 = rng.random(m), rng.random(m)
        sb = r1 > 0.76
        db = np.where(sb, r2 > 0.79, r2 > 0.75)
        src |= sb.astype(np.int64) << b
        dst |= db.astype(np.int64) << b
    suffix = ".wel" if weighted else ".el"
    fd, path = tempfile.mkstemp(suffix=suffix, prefix="graph_tpu_demo_")
    with os.fdopen(fd, "w") as f:
        if weighted:
            w = rng.random(m) * 4
            for s, d, ww in zip(src, dst, w):
                f.write(f"{s} {d} {ww:.4f}\n")
        else:
            for s, d in zip(src, dst):
                f.write(f"{s} {d}\n")
    return path


def connect(location: str) -> flight.FlightClient:
    return flight.connect(location)


def action(client, name: str, body: dict | None = None) -> dict:
    """Issue one server action and decode its JSON response."""
    payload = json.dumps(body or {}).encode()
    result = client.do_action(flight.Action(name, payload))
    return json.loads(next(iter(result)).body.to_pybytes())


def show(title: str, obj) -> None:
    print(f"== {title}")
    print(json.dumps(obj, indent=2))


def fetch_property(client, property_id: dict):
    """Stream a computed node property back as a pyarrow table."""
    ticket = flight.Ticket(json.dumps(property_id).encode())
    return client.do_get(ticket).read_all()
