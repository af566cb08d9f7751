"""Headline benchmark: PageRank GTEPS per chip on Graph500-class RMAT.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GTEPS", "vs_baseline": N}

The reference (neo4j-labs/graph) publishes no absolute numbers
(BASELINE.md), so ``vs_baseline`` reports the fraction of the
HBM-roofline edges/s for this chip — the BASELINE.json north star is
>= 0.70.  Roofline model: a pull PageRank iteration must move at least
~12 bytes per edge (4B source id + 4B gathered score at random +
amortized index/score writes) through HBM.

Engine: the EdgeEngine (graph_tpu.engine) — plan-compiled Pallas
kernels; set BENCH_ENGINE=cumsum for the plain-XLA path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SCALE = int(os.environ.get("BENCH_SCALE", "22"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
ENGINE = os.environ.get("BENCH_ENGINE", "plan")

# HBM bandwidth by TPU generation (bytes/s)
HBM_BW = {
    "v5 lite": 819e9,
    "v5litepod": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
    "v6": 1640e9,
}
BYTES_PER_EDGE = 12.0


def detect_bw():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, bw in HBM_BW.items():
        if k in kind:
            return bw
    return 819e9


def host_rmat(scale, edge_factor=16, seed=42):
    """Graph500 RMAT on the host (for plan building without transfers)."""
    rng = np.random.default_rng(seed)
    m = edge_factor << scale
    src = np.zeros(m, np.int64)
    dst = np.zeros(m, np.int64)
    # quadrant probabilities a=0.57 b=0.19 c=0.19 d=0.05
    for b in range(scale):
        r1 = rng.random(m)
        r2 = rng.random(m)
        src_bit = r1 > 0.57 + 0.19
        dst_bit = np.where(
            src_bit, r2 > 0.19 / (0.19 + 0.05), r2 > 0.57 / (0.57 + 0.19)
        )
        src |= src_bit.astype(np.int64) << b
        dst |= dst_bit.astype(np.int64) << b
    perm = rng.permutation(1 << scale)
    return perm[src], perm[dst]


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << SCALE
    src, dst = host_rmat(SCALE)
    m = src.size

    if ENGINE == "plan":
        from graph_tpu.engine.engine import EdgeEngine

        t0 = time.perf_counter()
        eng = EdgeEngine.build(src, dst, n)
        build_s = time.perf_counter() - t0
        print(f"# plan build {build_s:.1f}s, pad "
              f"{100*(eng.plan.nslots-m)/eng.plan.nslots:.1f}%", file=sys.stderr)

        outdeg = np.bincount(src, minlength=n).astype(np.float32)
        inv_outdeg = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1.0), 0.0)
        inv_outdeg = jnp.asarray(inv_outdeg)
        damping = jnp.float32(0.85)

        @jax.jit
        def run(inv_outdeg, dev):
            nf = jnp.float32(n)
            base = (1.0 - damping) / nf
            scores0 = jnp.full((n,), 1.0 / nf, jnp.float32)

            def body(it, state):
                scores, out_scores = state
                y = eng.spmv_dev(dev, out_scores)
                new_scores = base + damping * y
                return new_scores, new_scores * inv_outdeg

            s, _ = jax.lax.fori_loop(
                0, ITERS, body, (scores0, scores0 * inv_outdeg))
            return s

        dev = eng.dev
        s = run(inv_outdeg, dev)
        float(s[0])  # force
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = run(inv_outdeg, dev)
            float(s[0])
            best = min(best, time.perf_counter() - t0)
    else:
        from graph_tpu.graph.build import build_directed
        from graph_tpu.algos.pagerank import _page_rank_device

        g = build_directed(jnp.asarray(src), jnp.asarray(dst), node_count=n)
        args = (g.csr_in.sources, g.csr_in.targets, g.csr_in.offsets,
                g.out_degrees())
        kw = dict(max_iterations=ITERS, tolerance=jnp.float32(0.0),
                  damping_factor=jnp.float32(0.85), engine="cumsum")
        s, i, e = _page_rank_device(*args, **kw)
        float(e)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s, i, e = _page_rank_device(*args, **kw)
            float(e)
            best = min(best, time.perf_counter() - t0)

    gteps = m * ITERS / best / 1e9
    roofline = detect_bw() / BYTES_PER_EDGE / 1e9
    print(json.dumps({
        "metric": f"pagerank_gteps_rmat_scale{SCALE}_per_chip",
        "value": round(gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / roofline, 4),
    }))


if __name__ == "__main__":
    main()
