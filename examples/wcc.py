"""Weakly connected components over Flight.

Reference analog: crates/server/examples/wcc.py.  Run
``python -m graph_tpu.server`` first.
"""

import numpy as np

from common import action, connect, fetch_property, parse_args, show


def main():
    args = parse_args(__doc__)
    client = connect(args.location)

    show("create", action(client, "create", {
        "graph_name": "wcc-demo",
        "file_format": args.format,
        "path": args.path,
        "csr_layout": "Sorted",
        "orientation": "Directed",
    }))

    r = action(client, "compute", {
        "graph_name": "wcc-demo",
        "algorithm": {"Wcc": {}},
        "property_key": "components",
    })
    show("compute Wcc", r)

    comp = fetch_property(client, r["property_id"]).column(
        "component").to_numpy()
    labels, sizes = np.unique(comp, return_counts=True)
    print(f"{labels.size} components; largest has {sizes.max()} nodes")

    action(client, "remove", {"graph_name": "wcc-demo"})


if __name__ == "__main__":
    main()
