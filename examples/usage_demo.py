"""End-to-end Flight tour: create -> list -> PageRank -> fetch -> remove.

Mirrors the reference demo (crates/server/examples/usage-demo.py) on
the graph_tpu server.  Run ``python -m graph_tpu.server`` first, then
``python examples/usage_demo.py``.
"""

from common import action, connect, fetch_property, parse_args, show


def main():
    args = parse_args(__doc__)
    client = connect(args.location)

    show("create", action(client, "create", {
        "graph_name": "demo",
        "file_format": args.format,
        "path": args.path,
        "csr_layout": "Sorted",
        "orientation": "Directed",
    }))
    show("list", action(client, "list"))

    r = action(client, "compute", {
        "graph_name": "demo",
        "algorithm": {"PageRank": {
            "max_iterations": 20,
            "tolerance": 1e-4,
            "damping_factor": 0.85,
        }},
        "property_key": "page_rank",
    })
    show("compute PageRank", r)

    table = fetch_property(client, r["property_id"])
    scores = table.column("page_rank").to_numpy()
    top = scores.argsort()[-5:][::-1]
    print("top-5 nodes by score:")
    for node in top:
        print(f"  node {node}: {scores[node]:.6f}")

    show("remove", action(client, "remove", {"graph_name": "demo"}))


if __name__ == "__main__":
    main()
