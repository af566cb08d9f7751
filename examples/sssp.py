"""Single-source shortest paths (delta-stepping) over Flight.

Reference analog: crates/server/examples/sssp.py.  Needs a WEIGHTED
graph; by default a tiny weighted RMAT is generated.  Run
``python -m graph_tpu.server`` first.
"""

import numpy as np

from common import action, connect, fetch_property, parse_args, show


def main():
    args = parse_args(__doc__, weighted=True)
    client = connect(args.location)

    show("create", action(client, "create", {
        "graph_name": "sssp-demo",
        "file_format": args.format,
        "path": args.path,
        "csr_layout": "Sorted",
        "orientation": "Directed",
    }))

    r = action(client, "compute", {
        "graph_name": "sssp-demo",
        "algorithm": {"Sssp": {"start_node": 0, "delta": 2.0}},
        "property_key": "dist",
    })
    show("compute Sssp", r)

    dist = fetch_property(client, r["property_id"]).column(
        "distance").to_numpy()
    # unreached nodes carry the engine's +inf stand-in (~3e38)
    reachable = dist < 1e38
    print(f"reached {reachable.sum()}/{dist.size} nodes; "
          f"max finite distance {dist[reachable].max():.4f}")

    action(client, "remove", {"graph_name": "sssp-demo"})


if __name__ == "__main__":
    main()
