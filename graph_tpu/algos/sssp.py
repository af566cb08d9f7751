"""Single-source shortest paths: delta-stepping with dense bucket masks.

Reference analog: ``delta_stepping`` (crates/algos/src/sssp.rs:38-204):
AtomicF32 distances relaxed via CAS-min, a shared frontier claimed in
64-node batches, and per-thread distance-bucket bins.

TPU-first redesign — work lists become boolean masks over nodes:

* ``dist``    — f32 distances (unreached = f32::MAX, like sssp.rs:12),
* ``pending`` — nodes whose distance improved since they were last
  relaxed (the union of all thread-local bins),
* outer ``while_loop`` walks buckets in ascending order: the next bucket
  is the min ``floor(dist/delta)`` over pending nodes (reference:
  ``min_non_empty_bin``, sssp.rs:159-168),
* inner ``while_loop`` settles the current bucket: relax every out-edge
  of the frontier via one gather + segment-min over the in-CSR (replaces
  the CAS-min loop, sssp.rs:184-202) and re-activate improved nodes.

Both versions compute exact shortest-path distances: every final value
is a sum of edge weights accumulated in path order, so results are
bit-identical to the reference (golden ``[0, 4, 2, 9, 5, 20]``,
sssp.rs:283-313).  Dense masks trade wasted edge work on small frontiers
for zero host round-trips — SURVEY.md §7 "hard parts" #2 tracks the
frontier-compaction follow-up.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_tpu.graph.csr import DirectedCsrGraph
from graph_tpu.ops.segment import segment_min_sorted

INF = np.float32(np.finfo(np.float32).max)  # f32::MAX, sssp.rs:12
_NO_BIN = np.int32(np.iinfo(np.int32).max)


@dataclasses.dataclass(frozen=True)
class DeltaSteppingConfig:
    """Reference analog: ``DeltaSteppingConfig`` (sssp.rs:21-36).

    ``engine`` (TPU-specific): "xla" = bucketed delta-stepping with
    dense masks; "plan" = EdgeEngine Bellman-Ford (vectorized tropical
    relaxations; faster at scale); "frontier" = compacted-frontier
    delta-stepping over a degree-padded adjacency matrix (work-efficient
    on high-diameter low-degree graphs — grids, road networks — where
    dense per-round edge sweeps relax every edge thousands of times);
    "auto" picks by shape (low max degree => frontier, else by size).
    """
    start_node: int
    delta: float
    engine: str = "auto"


@dataclasses.dataclass(frozen=True)
class SsspResult:
    distances: jax.Array  # (n,) f32; unreached = f32::MAX
    micros: int

    def distances_np(self) -> np.ndarray:
        return np.asarray(self.distances)


@jax.jit
def _delta_stepping_device(
    in_sources: jax.Array,  # (m,) dst row ids, ascending
    in_targets: jax.Array,  # (m,) src per in-edge
    in_weights: jax.Array,  # (m,) f32
    start_node: jax.Array,  # i32 scalar
    delta: jax.Array,  # f32 scalar
    n_arr: jax.Array,  # shape carrier (n,)
) -> jax.Array:
    n = n_arr.shape[0]
    dist0 = jnp.full((n,), INF, dtype=jnp.float32).at[start_node].set(0.0)
    pending0 = jnp.zeros((n,), dtype=bool).at[start_node].set(True)

    def bucket_of(dist):
        # floor(dist/delta); unreached maps to a huge bucket.
        # Clamp before the int cast: f32::MAX/delta overflows int32.
        q = jnp.minimum(dist / delta, jnp.float32(2**31 - 128))
        return jnp.where(dist < INF, q.astype(jnp.int32), _NO_BIN)

    def relax(dist, frontier):
        """One synchronous relaxation of all out-edges of ``frontier``."""
        src_active = frontier[in_targets]
        cand = jnp.where(src_active, dist[in_targets] + in_weights, INF)
        best = segment_min_sorted(cand, in_sources, n)
        new_dist = jnp.minimum(dist, best)
        improved = new_dist < dist
        return new_dist, improved

    def inner_cond(state):
        dist, pending, curr_bin = state
        return jnp.any(pending & (bucket_of(dist) == curr_bin))

    def inner_body(state):
        dist, pending, curr_bin = state
        frontier = pending & (bucket_of(dist) == curr_bin)
        pending = pending & ~frontier
        dist, improved = relax(dist, frontier)
        return dist, pending | improved, curr_bin

    def outer_cond(state):
        _, _, curr_bin = state
        return curr_bin != _NO_BIN

    def outer_body(state):
        dist, pending, curr_bin = state
        dist, pending, _ = jax.lax.while_loop(
            inner_cond, inner_body, (dist, pending, curr_bin)
        )
        next_bin = jnp.min(jnp.where(pending, bucket_of(dist), _NO_BIN))
        return dist, pending, next_bin

    dist, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, (dist0, pending0, jnp.int32(0))
    )
    return dist


#: Frontier-engine limits: nodes claimed per settle step (the reference
#: claims 64-node batches per thread, sssp.rs:14; one vector "thread"
#: claims a few thousand) and the max degree the padded adjacency
#: accepts (grids are 4-8; power-law graphs blow past it immediately).
_FRONTIER_CAP = 8192
_FRONTIER_MAX_DEG = 64


@functools.partial(jax.jit, static_argnames=("cap",))
def _sssp_frontier_device(
    adj_t: jax.Array,   # (n+1, D) int32 out-targets, pad rows/slots = n
    adj_w: jax.Array,   # (n+1, D) f32 weights, pad = INF
    start_node: jax.Array,  # i32 scalar
    delta: jax.Array,   # f32 scalar
    *, cap: int = _FRONTIER_CAP,
) -> jax.Array:
    """Compacted-frontier delta-stepping (engine="frontier").

    The TPU analog of the reference's work-list loop (sssp.rs:104-157):
    instead of per-thread bins + CAS-min, each settle step compacts up
    to ``cap`` frontier nodes into a static-shape id vector
    (``jnp.nonzero(size=cap)``), gathers their padded adjacency rows,
    and scatter-mins the relaxations.  Work per step is O(n/VPU +
    cap * D) instead of O(m) — on a 1024x1024 grid the dense
    Bellman-Ford sweep relaxes every edge ~2000x; this touches each
    edge O(1) times per bucket.  Distances stay exact f32 path sums
    (bit-identical to the other engines on the goldens).
    """
    n = adj_t.shape[0] - 1
    dist0 = jnp.full((n + 1,), INF, jnp.float32).at[start_node].set(0.0)
    pending0 = jnp.zeros((n + 1,), bool).at[start_node].set(True)

    def bucket_of(dist):
        q = jnp.minimum(dist / delta, jnp.float32(2**31 - 128))
        return jnp.where(dist < INF, q.astype(jnp.int32), _NO_BIN)

    def inner_cond(state):
        dist, pending, curr_bin = state
        return jnp.any(pending & (bucket_of(dist) == curr_bin))

    def inner_body(state):
        dist, pending, curr_bin = state
        frontier = pending & (bucket_of(dist) == curr_bin)
        ids = jnp.nonzero(frontier, size=cap, fill_value=n)[0]
        pending = pending & ~jnp.zeros_like(pending).at[ids].set(True)
        cand_t = adj_t[ids].reshape(-1)            # (cap*D,)
        cand = (dist[ids][:, None] + adj_w[ids]).reshape(-1)
        new_dist = dist.at[cand_t].min(cand)
        # pad slots target row n with weight INF: never an improvement
        improved = new_dist < dist
        return new_dist, pending | improved, curr_bin

    def outer_cond(state):
        return state[2] != _NO_BIN

    def outer_body(state):
        dist, pending, curr_bin = state
        dist, pending, _ = jax.lax.while_loop(
            inner_cond, inner_body, (dist, pending, curr_bin))
        next_bin = jnp.min(jnp.where(pending, bucket_of(dist), _NO_BIN))
        return dist, pending, next_bin

    dist, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, (dist0, pending0, jnp.int32(0)))
    return dist[:n]


def _max_out_degree(graph: DirectedCsrGraph) -> int:
    """Max out-degree as a host int (ONE device scalar fetch, cached —
    downloading the offsets array runs at ~0.2 MB/s on the tunnel)."""
    cached = getattr(graph, "_max_out_degree", None)
    if cached is None:
        if graph.edge_count == 0:
            cached = 0
        else:
            cached = int(jnp.max(jnp.diff(graph.csr_out.offsets)))
        object.__setattr__(graph, "_max_out_degree", cached)
    return cached


def _sssp_frontier(graph: DirectedCsrGraph, config) -> SsspResult:
    """Pack the out-CSR into a degree-padded (n+1, D) adjacency matrix
    and run :func:`_sssp_frontier_device`.  Row/slot pads point at the
    sentinel row ``n`` with weight INF (relaxations through them never
    improve).  Packing runs on device (one m-element scatter) — the
    matrix is cached on the graph object."""
    n = graph.node_count
    cached = getattr(graph, "_frontier_adj", None)
    if cached is None:
        d_max = max(1, _max_out_degree(graph))
        if (n + 1) * d_max >= (1 << 31):  # flat scatter index is int32
            raise ValueError(
                f"frontier engine needs (n+1)*max_degree < 2^31, got "
                f"{n + 1} * {d_max}; use engine='plan' or 'xla'")
        # int32 flat index throughout: the (n+1)*d_max < 2^31 guard
        # above makes every value fit, and int64 here would silently
        # truncate anyway without jax_enable_x64 (ADVICE round-4)
        srcs = graph.csr_out.sources.astype(jnp.int32)
        tgts = graph.csr_out.targets.astype(jnp.int32)
        wts = graph.csr_out.values.astype(jnp.float32)
        pos = (jnp.arange(srcs.shape[0], dtype=jnp.int32)
               - graph.csr_out.offsets[srcs].astype(jnp.int32))
        flat = srcs * jnp.int32(d_max) + pos
        adj_t = (jnp.full((n + 1) * d_max, n, jnp.int32)
                 .at[flat].set(tgts).reshape(n + 1, d_max))
        adj_w = (jnp.full((n + 1) * d_max, INF, jnp.float32)
                 .at[flat].set(wts).reshape(n + 1, d_max))
        cached = (adj_t, adj_w)
        object.__setattr__(graph, "_frontier_adj", cached)
    start = time.perf_counter()
    dist = _sssp_frontier_device(cached[0], cached[1],
                                 jnp.int32(config.start_node),
                                 jnp.float32(config.delta))
    dist.block_until_ready()
    micros = int((time.perf_counter() - start) * 1e6)
    return SsspResult(distances=dist, micros=micros)


def delta_stepping(
    graph: DirectedCsrGraph, config: DeltaSteppingConfig
) -> SsspResult:
    """Compute SSSP distances from ``config.start_node``.

    Mirrors ``delta_stepping(&g, DeltaSteppingConfig) -> Vec<AtomicF32>``
    (sssp.rs:38).  Requires an edge-weighted directed graph.
    """
    if graph.csr_in.values is None:
        raise ValueError("delta_stepping requires edge weights (values)")
    from graph_tpu.algos.pagerank import _default_mesh

    mesh = _default_mesh()
    if mesh is not None and getattr(config, "engine", "auto") not in (
            "auto", None):
        mesh = None  # explicit engine pin wins over the default mesh
    if mesh is not None:
        from graph_tpu.engine.engine import engine_for
        from graph_tpu.parallel.mesh import mesh_key

        if (graph.edge_count >= (1 << 21)
                and jax.default_backend() == "tpu"):
            from graph_tpu.parallel.sssp import (
                shard_weighted_graph_plan, sssp_rowblock)

            rbe = engine_for(graph, ("rowblock-w",) + mesh_key(mesh),
                             lambda: shard_weighted_graph_plan(graph, mesh))
            return sssp_rowblock(rbe, config)
        from graph_tpu.parallel.sssp import shard_weighted_graph, sssp_sharded

        sg = engine_for(graph, ("sharded-weighted",) + mesh_key(mesh),
                        lambda: shard_weighted_graph(graph, mesh))
        return sssp_sharded(sg, mesh, config)
    engine = getattr(config, "engine", "auto")
    if engine == "auto":
        if (graph.edge_count >= (1 << 21)
                and jax.default_backend() == "tpu"):
            # Plan-kernel dense sweeps win on TPU even at grid
            # diameters (round 5, 1024x1024 grid: plan 1.21 s vs
            # frontier 51.5 s — a dense pass costs ~0.6 ms so ~2000
            # rounds are cheap, while each frontier settle step pays
            # ~10 ms of composite small-op overhead on this backend).
            engine = "plan"
        else:
            # Off-TPU (or small graphs): a low max degree on a large
            # graph signals high diameter (grids, road networks) —
            # dense per-round sweeps there relax every edge ~diameter
            # times, while the compacted frontier touches each edge
            # O(1) times per bucket.
            dmax = _max_out_degree(graph)
            if (graph.node_count >= (1 << 16)
                    and 0 < dmax <= _FRONTIER_MAX_DEG
                    and (graph.node_count + 1) * dmax < (1 << 31)):
                engine = "frontier"
            else:
                engine = "xla"
    if engine == "frontier":
        return _sssp_frontier(graph, config)
    if engine == "plan":
        return _sssp_plan(graph, config)
    start = time.perf_counter()
    dist = _delta_stepping_device(
        graph.csr_in.sources,
        graph.csr_in.targets,
        graph.csr_in.values.astype(jnp.float32),
        jnp.int32(config.start_node),
        jnp.float32(config.delta),
        jnp.zeros((graph.node_count,), dtype=jnp.int8),
    )
    dist.block_until_ready()
    micros = int((time.perf_counter() - start) * 1e6)
    return SsspResult(distances=dist, micros=micros)


# ---------------------------------------------------------------------------
# EdgeEngine-based SSSP (engine="plan"): vectorized Bellman-Ford

def _weighted_engine(graph: DirectedCsrGraph):
    from graph_tpu.engine.engine import EdgeEngine, engine_for

    def build():
        return EdgeEngine.build(
            np.asarray(graph.csr_out.sources),
            np.asarray(graph.csr_out.targets),
            graph.node_count,
            values=np.asarray(graph.csr_out.values, np.float32),
            relabel="degree",  # see pagerank._graph_engine
        )

    return engine_for(graph, "fwd_weighted", build)


def _sssp_plan(graph: DirectedCsrGraph, config) -> SsspResult:
    """Bellman-Ford on the EdgeEngine's tropical relaxation kernel.

    Each round relaxes every edge (dist[d] <- min(dist[d], dist[s]+w))
    in two vectorized engine passes; rounds = weighted hop diameter.
    Exact: every distance is a path-ordered sum of f32 edge weights,
    matching the reference golden (sssp.rs:283-313).  The reference's
    delta-stepping buckets are a CPU work-avoidance scheme; on TPU the
    dense relaxation touches all edges at full vector throughput.
    """
    eng = _weighted_engine(graph)
    n = graph.node_count

    run = getattr(eng, "_sssp_run", None)
    if run is None:
        @jax.jit
        def run(dev, start_node):
            from graph_tpu.engine.engine import permute

            relabeled = "perm" in dev
            if relabeled:  # iterate in the plan's internal node order
                start_node = dev["perm"][start_node]
            inf = jnp.float32(3.0e38)
            dist0 = jnp.full((n,), inf, jnp.float32).at[start_node].set(0.0)

            def cond(state):
                _, changed, _ = state
                return changed

            def body(state):
                dist, _, it = state
                nd = jnp.minimum(dist, eng.relax_dev(dev, dist,
                                                     internal=True))
                return nd, jnp.any(nd != dist), it + 1

            dist, _, iters = jax.lax.while_loop(
                cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
            if relabeled:
                dist = permute(dev["iperm"], dist)
            return dist, iters

        eng._sssp_run = run

    start = time.perf_counter()
    dist, _iters = run(eng.dev, jnp.int32(config.start_node))
    dist.block_until_ready()
    micros = int((time.perf_counter() - start) * 1e6)
    # unreached sentinel: the reference keeps f32::MAX (sssp.rs:12)
    dist = jnp.where(dist >= jnp.float32(3.0e38), jnp.float32(INF), dist)
    return SsspResult(distances=dist, micros=micros)
