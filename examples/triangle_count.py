"""Global triangle count over Flight.

Reference analog: crates/server/examples/triangle-count.py — create a
directed graph, convert to a deduplicated undirected view on the
server, then count distinct triangles.  Run ``python -m
graph_tpu.server`` first.
"""

from common import action, connect, parse_args, show


def main():
    args = parse_args(__doc__)
    client = connect(args.location)

    show("create", action(client, "create", {
        "graph_name": "tc-demo",
        "file_format": args.format,
        "path": args.path,
        "csr_layout": "Sorted",
        "orientation": "Directed",
    }))

    # distinct-triangle semantics need the deduplicated undirected view
    # (reference: to_undirected with Deduplicated layout)
    show("to_undirected", action(client, "to_undirected", {
        "graph_name": "tc-demo",
        "csr_layout": "Deduplicated",
    }))

    r = action(client, "compute", {
        "graph_name": "tc-demo",
        "algorithm": {"TriangleCount": {}},
        "property_key": "triangle_count",
    })
    show("compute TriangleCount", r)
    print(f"triangles: {r['algo_result']['triangle_count']}")

    action(client, "remove", {"graph_name": "tc-demo"})


if __name__ == "__main__":
    main()
