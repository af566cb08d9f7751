"""Benchmark/driver CLI.

Reference analog: the ``app`` binary (crates/app/src/app.rs:41-153):

    app -p <path> [-f edge-list|graph500] [--use-32-bit] [-r runs]
        [-w warmup-runs] <page-rank|sssp|triangle-count|wcc|loading|serialize>

Differences from the reference: warmup runs double as JIT compilation
(the XLA analog of cache warmup), ``--use-32-bit`` selects the id dtype
(int32 is already the default, matching graph_mate), and
``-g adjacency-list`` maps to the edge-buffer graph.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

log = logging.getLogger("graph_tpu.app")


def _common(parser):
    parser.add_argument("-p", "--path", required=True)
    parser.add_argument(
        "-f", "--format", choices=["edge-list", "graph500"], default="edge-list"
    )
    parser.add_argument(
        "-g",
        "--graph",
        choices=["csr", "adjacency-list"],
        default="csr",
        help="graph storage (adjacency-list = mutable edge buffer)",
    )
    parser.add_argument("--use-32-bit", action="store_true")
    parser.add_argument(
        "--plan-cache",
        default=None,
        metavar="DIR",
        help="persist compiled EdgePlans here (also $GRAPH_TPU_PLAN_CACHE); "
        "a second run on the same graph skips the plan build",
    )
    parser.add_argument("-r", "--runs", type=int, default=1)
    parser.add_argument("-w", "--warmup-runs", type=int, default=5)
    parser.add_argument("-v", "--verbose", action="count", default=1)
    parser.add_argument(
        "--platform",
        choices=["tpu", "cpu", "default"],
        default="default",
        help="force the JAX backend (default: environment's choice)",
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the timed runs to DIR "
        "(view in TensorBoard/Perfetto)",
    )


def build_parser():
    p = argparse.ArgumentParser(prog="graph-tpu", description=__doc__)
    sub = p.add_subparsers(dest="algorithm", required=True)

    pr = sub.add_parser("page-rank")
    _common(pr)
    pr.add_argument("--max-iterations", type=int, default=20)
    pr.add_argument("--tolerance", type=float, default=1e-4)
    pr.add_argument("--damping-factor", type=float, default=0.85)

    ss = sub.add_parser("sssp")
    _common(ss)
    ss.add_argument("--start-node", type=int, required=True)
    ss.add_argument("--delta", type=float, required=True)

    tc = sub.add_parser("triangle-count")
    _common(tc)
    tc.add_argument("--relabel", action="store_true")

    wc = sub.add_parser("wcc")
    _common(wc)
    wc.add_argument("--chunk-size", type=int, default=16384)
    wc.add_argument("--neighbor-rounds", type=int, default=2)
    wc.add_argument("--sampling-size", type=int, default=1024)

    ld = sub.add_parser("loading")
    _common(ld)
    ld.add_argument("--undirected", action="store_true")
    ld.add_argument("--weighted", action="store_true")

    se = sub.add_parser("serialize")
    _common(se)
    se.add_argument("-o", "--output", required=True)
    se.add_argument("--undirected", action="store_true")

    return p


def timed_runs(runs: int, warmup_runs: int, f, profile_dir=None):
    """Reference ``time()`` analog (app.rs:124-153); optionally wraps
    the measured runs in a jax.profiler trace capture."""
    import contextlib

    for run in range(1, warmup_runs + 1):
        t0 = time.perf_counter()
        f()
        log.info(
            "Warm-up run %d of %d finished in %.6fs",
            run,
            warmup_runs,
            time.perf_counter() - t0,
        )
    if profile_dir:
        from graph_tpu.profile import trace

        ctx = trace(profile_dir)
    else:
        ctx = contextlib.nullcontext()
    durations = []
    with ctx:
        for run in range(1, runs + 1):
            t0 = time.perf_counter()
            f()
            took = time.perf_counter() - t0
            durations.append(took)
            log.info("Run %d of %d finished in %.6fs", run, runs, took)
    if durations:
        log.info("Average runtime: %.6fs", sum(durations) / len(durations))
    return durations


def _id_dtype(args):
    """Reference parity: the app defaults to 64-bit ids (usize) and
    ``--use-32-bit`` switches to u32 (app.rs:60-66).  Here 64-bit ids
    are gated on JAX x64 mode; without it we fall back to int32 (the
    graph_mate default) with a log note."""
    if args.use_32_bit:
        return np.int32
    import jax

    if jax.config.jax_enable_x64:
        return np.int64
    log.info(
        "ids default to 32-bit here (64-bit needs JAX_ENABLE_X64=1; "
        "the reference defaults to usize, app.rs:60-66)"
    )
    return np.int32


def _load(args, undirected=False, weighted=False):
    from graph_tpu.builder import GraphBuilder
    from graph_tpu.graph.csr import CsrLayout
    from graph_tpu.io.edgelist import EdgeListInput
    from graph_tpu.io.graph500 import Graph500Input

    id_dtype = _id_dtype(args)
    fmt = (
        Graph500Input()
        if args.format == "graph500"
        else EdgeListInput(weighted=weighted or None)
    )
    undirected = getattr(args, "algorithm", "") == "triangle-count" or undirected
    layout = CsrLayout.DEDUPLICATED if undirected else CsrLayout.UNSORTED
    if args.graph == "adjacency-list":
        # `-g adjacency-list` benchmarks the mutable edge-buffer storage
        # (app.rs:71-76 analog): bulk-load into the AL graph, snapshot.
        from graph_tpu.graph.adj import DirectedALGraph, UndirectedALGraph

        src, dst, values, node_count = fmt.read(args.path)
        if node_count is None:
            node_count = int(max(src.max(), dst.max())) + 1 if len(src) else 0
        cls = UndirectedALGraph if undirected else DirectedALGraph
        al = cls(node_count, edges=list(zip(src.tolist(), dst.tolist())),
                 values=values, layout=layout, id_dtype=id_dtype)
        return al.snapshot()
    b = GraphBuilder().id_dtype(id_dtype).file_format(fmt).path(args.path)
    if undirected:
        b = b.csr_layout(layout)
        # triangle counting's prep reads the edge list on the host; a
        # host-resident build avoids the ~0.2 MB/s device->host tunnel
        host = getattr(args, "algorithm", "") == "triangle-count"
        return b.build_undirected(host=host)
    return b.build_directed()


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "plan_cache", None):
        import os

        os.environ["GRAPH_TPU_PLAN_CACHE"] = args.plan_cache
    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    from graph_tpu import enable_compile_cache

    enable_compile_cache()
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s %(levelname)s %(name)s - %(message)s",
    )
    log.info("Reading graph (%d bit) from: %s",
             np.dtype(_id_dtype(args)).itemsize * 8, args.path)

    if args.algorithm == "page-rank":
        from graph_tpu.algos.pagerank import PageRankConfig, page_rank

        g = _load(args)
        # -v -v: per-iteration error/time lines, like the reference app
        # (page_rank.rs:98-103 logs each iteration at info level).
        # verbose counts from 1 (info is the default level), so two -v
        # flags reach 3 — a single -v must NOT silently trade the
        # device-resident while_loop for a host sync per iteration.
        cfg = PageRankConfig(args.max_iterations, args.tolerance,
                             args.damping_factor,
                             log_progress=args.verbose >= 3)

        def run():
            res = page_rank(g, cfg)
            log.info(
                "PageRank ran %d iterations with error %e",
                res.ran_iterations,
                res.error,
            )

        timed_runs(args.runs, args.warmup_runs, run, args.profile)

    elif args.algorithm == "sssp":
        from graph_tpu.algos.sssp import DeltaSteppingConfig, delta_stepping

        g = _load(args, weighted=True)
        cfg = DeltaSteppingConfig(args.start_node, args.delta)
        timed_runs(args.runs, args.warmup_runs,
                   lambda: delta_stepping(g, cfg), args.profile)

    elif args.algorithm == "triangle-count":
        from graph_tpu.algos.triangle_count import global_triangle_count
        from graph_tpu.graph.ops import make_degree_ordered

        g = _load(args, undirected=True)
        if args.relabel:
            t0 = time.perf_counter()
            g = make_degree_ordered(g)
            log.info("Relabeled graph in %.3fs", time.perf_counter() - t0)

        def run():
            res = global_triangle_count(g)
            log.info("Computed %s triangles", f"{res.triangles:,}")

        timed_runs(args.runs, args.warmup_runs, run, args.profile)

    elif args.algorithm == "wcc":
        from graph_tpu.algos.wcc import WccConfig, wcc

        g = _load(args)
        cfg = WccConfig(args.chunk_size, args.neighbor_rounds, args.sampling_size)
        timed_runs(args.runs, args.warmup_runs, lambda: wcc(g, cfg),
                   args.profile)

    elif args.algorithm == "loading":
        # parse benchmark (app/src/loading.rs:11-75 analog)
        def run():
            g = _load(args, undirected=args.undirected, weighted=args.weighted)
            log.info(
                "Loaded %d nodes and %d edges", g.node_count, g.edge_count
            )

        timed_runs(args.runs, args.warmup_runs, run)

    elif args.algorithm == "serialize":
        # el -> binary -> reload -> verify (app/src/serialize.rs:14-109)
        from graph_tpu.io.binary import load_graph, save_graph

        g = _load(args, undirected=args.undirected)
        t0 = time.perf_counter()
        save_graph(args.output, g)
        log.info("Serialized graph in %.3fs", time.perf_counter() - t0)
        t0 = time.perf_counter()
        g2 = load_graph(args.output)
        log.info("Deserialized graph in %.3fs", time.perf_counter() - t0)
        assert g2.node_count == g.node_count
        assert g2.edge_count == g.edge_count
        log.info("Serialization roundtrip verified")

    return 0


if __name__ == "__main__":
    sys.exit(main())
