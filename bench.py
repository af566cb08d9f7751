"""Headline benchmark: PageRank GTEPS per chip on Graph500-class RMAT.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GTEPS", "vs_baseline": N}

The reference (neo4j-labs/graph) publishes no absolute numbers
(BASELINE.md), so ``vs_baseline`` reports the fraction of the
HBM-roofline edges/s for this chip — the BASELINE.json north star is
>= 0.70.  Roofline model: a pull PageRank iteration must move at least
~12 bytes per edge (4B source id + 4B gathered score at random +
amortized index/score writes) through HBM.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

SCALE = int(os.environ.get("BENCH_SCALE", "22"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))

# HBM bandwidth by TPU generation (bytes/s)
HBM_BW = {
    "v5 lite": 819e9,   # v5e
    "v5litepod": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
    "v6": 1640e9,
}
BYTES_PER_EDGE = 12.0


def detect_bw():
    kind = jax.devices()[0].device_kind.lower()
    for k, bw in HBM_BW.items():
        if k in kind:
            return bw
    return 819e9


def main():
    from graph_tpu.generate import rmat_edges
    from graph_tpu.graph.build import build_directed
    from graph_tpu.algos.pagerank import _page_rank_device

    key = jax.random.key(42)
    src, dst = rmat_edges(key, scale=SCALE)
    g = build_directed(src, dst, node_count=1 << SCALE)
    m = g.csr_in.edge_count

    args = (
        g.csr_in.sources,
        g.csr_in.targets,
        g.csr_in.offsets,
        g.out_degrees(),
    )
    kw = dict(
        max_iterations=ITERS,
        tolerance=jnp.float32(0.0),  # run all iterations
        damping_factor=jnp.float32(0.85),
        engine="cumsum",
    )

    # warmup (compile); float() forces real execution — block_until_ready
    # is unreliable through remote-tunnel backends
    s, i, e = _page_rank_device(*args, **kw)
    float(e)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, i, e = _page_rank_device(*args, **kw)
        float(e)
        best = min(best, time.perf_counter() - t0)

    iters = int(i)
    gteps = m * iters / best / 1e9
    roofline = detect_bw() / BYTES_PER_EDGE / 1e9
    print(
        json.dumps(
            {
                "metric": f"pagerank_gteps_rmat_scale{SCALE}_per_chip",
                "value": round(gteps, 4),
                "unit": "GTEPS",
                "vs_baseline": round(gteps / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
