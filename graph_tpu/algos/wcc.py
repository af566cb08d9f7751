"""Weakly connected components via min-label propagation + pointer jumping.

Reference analog: ``wcc_baseline`` / ``wcc_afforest`` / ``wcc_afforest_dss``
(crates/algos/src/wcc.rs:103-183) built on CAS-based union-find structures
(crates/algos/src/dss.rs:20-173, afforest.rs:15-115) following Sutton et
al.'s Afforest subgraph-sampling heuristic.

TPU-first redesign: union-find's pointer CAS loops have no efficient XLA
analog, so connectivity is computed as a *min-label fixed point*
(Shiloach-Vishkin style):

    comp[u] ← min(comp[u], min over neighbors v of comp[v])   (hook)
    comp ← comp[comp]                                          (jump)

iterated inside one ``lax.while_loop`` until unchanged.  Hooks are two
sorted segment-mins (one per CSR direction — the reference also links
both out- and in-edges, wcc.rs:274-301); jumps square the pointer chain
so convergence is O(log n) rounds.  At the fixed point ``comp[u]`` is the
minimum node id in u's component, a canonical representative (the
reference returns arbitrary representatives; only the partition is
specified, see its tests wcc.rs:307-329).

Afforest's sampling trick (link 2 neighbors, detect the largest
component, skip its nodes) is a work-skipping heuristic for CPU atomics;
dense segment ops already touch every edge in parallel, so the heuristic
buys nothing here and is intentionally not replicated.  ``WccConfig``
keeps the reference's fields for API compatibility.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from graph_tpu.graph.csr import DirectedCsrGraph, UndirectedCsrGraph
from graph_tpu.ops.segment import segment_min_sorted


@dataclasses.dataclass(frozen=True)
class WccConfig:
    """Reference analog: ``WccConfig`` (wcc.rs:43-79).

    The fields are accepted for parity with the reference API; the
    min-label algorithm has no chunking or sampling phase, so they do
    not change the result (which is fully specified) nor the schedule.
    """

    chunk_size: int = 16384
    neighbor_rounds: int = 2
    sampling_size: int = 1024
    engine: str = "auto"  # "xla" | "plan" | "auto" (TPU-specific)

    DEFAULT_CHUNK_SIZE = 16384
    DEFAULT_NEIGHBOR_ROUNDS = 2
    DEFAULT_SAMPLING_SIZE = 1024


@dataclasses.dataclass(frozen=True)
class WccResult:
    """Reference analog: the ``Components`` trait (wcc.rs:95-99) + mate's
    ``WccResult`` (crates/mate/src/wcc.rs:43-88)."""

    components: jax.Array  # (n,) id dtype — component = min node id
    ran_iterations: int
    micros: int

    def component(self, node: int) -> int:
        return int(self.components[node])

    def components_np(self) -> np.ndarray:
        return np.asarray(self.components)


@jax.jit
def _wcc_device(
    fwd_sources: jax.Array,
    fwd_targets: jax.Array,
    bwd_sources: jax.Array,
    bwd_targets: jax.Array,
    n_arr: jax.Array,  # shape-only carrier: (n,) any dtype
):
    n = n_arr.shape[0]
    comp0 = jnp.arange(n, dtype=fwd_targets.dtype)

    def cond(state):
        _, changed, _ = state
        return changed

    def body(state):
        comp, _, it = state
        # Hook: pull the minimum label across both edge directions.
        m_out = segment_min_sorted(comp[fwd_targets], fwd_sources, n)
        m_in = segment_min_sorted(comp[bwd_targets], bwd_sources, n)
        new = jnp.minimum(comp, jnp.minimum(m_out, m_in))
        # Jump: shortcut pointer chains (two squarings per round).
        new = new[new]
        new = new[new]
        changed = jnp.any(new != comp)
        return new, changed, it + 1

    comp, _, iters = jax.lax.while_loop(
        cond, body, (comp0, jnp.bool_(True), jnp.int32(0))
    )
    return comp, iters


def wcc(
    graph: Union[DirectedCsrGraph, UndirectedCsrGraph],
    config: Optional[WccConfig] = None,
) -> WccResult:
    """Compute weakly connected components.

    Mirrors ``wcc_afforest_dss(&g, WccConfig) -> impl Components``
    (wcc.rs:144); accepts directed or undirected CSR graphs.

    Runnable example (reference doctest analog, wcc.rs:307-329):

    >>> from graph_tpu import GraphBuilder, wcc
    >>> g = GraphBuilder().edges([(0, 1), (2, 3)]).build_directed()
    >>> [int(c) for c in wcc(g).components_np()]
    [0, 0, 2, 2]
    """
    config = config or WccConfig()
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
            from graph_tpu.parallel.wcc import (
                shard_hook_graph_plan, wcc_rowblock)

            rbe = engine_for(graph, ("rowblock-sym",) + mesh_key(mesh),
                             lambda: shard_hook_graph_plan(graph, mesh))
            return wcc_rowblock(rbe, config)
        from graph_tpu.parallel.wcc import shard_hook_graph, wcc_sharded

        sg = engine_for(graph, ("sharded-hook",) + mesh_key(mesh),
                        lambda: shard_hook_graph(graph, mesh))
        return wcc_sharded(sg, mesh, config)
    engine = getattr(config, "engine", "auto")
    if engine == "auto":
        engine = ("plan" if graph.edge_count >= (1 << 21)
                  and jax.default_backend() == "tpu" else "xla")
    if engine == "plan":
        return _wcc_plan(graph)
    start = time.perf_counter()
    if isinstance(graph, UndirectedCsrGraph):
        # Both directions already present in the single CSR.
        fwd = bwd = graph.csr
    else:
        fwd, bwd = graph.csr_out, graph.csr_in
    n = graph.node_count
    shape_carrier = jnp.zeros((n,), dtype=jnp.int8)
    comp, iters = _wcc_device(
        fwd.sources, fwd.targets, bwd.sources, bwd.targets, shape_carrier
    )
    comp.block_until_ready()
    micros = int((time.perf_counter() - start) * 1e6)
    return WccResult(components=comp, ran_iterations=int(iters), micros=micros)


def wcc_components(graph, config: Optional[WccConfig] = None) -> jax.Array:
    """Convenience: just the component-id array."""
    return wcc(graph, config).components


def wcc_baseline(graph, config: Optional[WccConfig] = None) -> WccResult:
    """Reference analog: ``wcc_baseline`` (wcc.rs:103) — link every edge.

    All three reference variants compute the same fully-specified
    partition; they differ only in CPU work-skipping heuristics
    (Afforest sampling) that have no payoff for dense segment ops, so
    each maps to the same min-label fixed point here (see module doc).
    """
    return wcc(graph, config)


def wcc_afforest(graph, config: Optional[WccConfig] = None) -> WccResult:
    """Reference analog: ``wcc_afforest`` (wcc.rs:127). See
    :func:`wcc_baseline` for why the variants share one TPU kernel."""
    return wcc(graph, config)


def wcc_afforest_dss(graph, config: Optional[WccConfig] = None) -> WccResult:
    """Reference analog: ``wcc_afforest_dss`` (wcc.rs:144). See
    :func:`wcc_baseline` for why the variants share one TPU kernel."""
    return wcc(graph, config)


# ---------------------------------------------------------------------------
# EdgeEngine-based WCC (engine="plan"): vectorized min-label hooks

def _sym_engine(graph):
    """EdgeEngine over the symmetrized edge list (weakly connected)."""
    from graph_tpu.engine.engine import EdgeEngine, engine_for

    def build():
        if isinstance(graph, UndirectedCsrGraph):
            src = np.asarray(graph.csr.sources)
            dst = np.asarray(graph.csr.targets)
        else:
            s0 = np.asarray(graph.csr_out.sources)
            t0 = np.asarray(graph.csr_out.targets)
            src = np.concatenate([s0, t0])
            dst = np.concatenate([t0, s0])
        return EdgeEngine.build(src, dst, graph.node_count)

    return engine_for(graph, "sym", build)


def _wcc_plan(graph) -> WccResult:
    """Min-label propagation with the EdgeEngine's INTEGER segment-min.

    Labels are int32 node ids end to end (round 2 — the round-1 f32
    label carrier was exact only to 2**24 and silently wrong above);
    hooks are one engine pass over the symmetrized edges; pointer jumps
    use an n-sized XLA gather (cheap relative to the m-sized hook).
    """
    n = graph.node_count
    from graph_tpu.dtypes import check_node_count_fits

    check_node_count_fits(n, np.int32)  # labels are int32 node ids
    eng = _sym_engine(graph)

    run = getattr(eng, "_wcc_run", None)
    if run is None:
        @jax.jit
        def run(dev):
            comp0 = jnp.arange(n, dtype=jnp.int32)

            def cond(state):
                _, changed, _ = state
                return changed

            def body(state):
                comp, _, it = state
                new = jnp.minimum(comp, eng.smin_int_dev(dev, comp))
                new = new[new]          # jump (squares pointer chains)
                new = new[new]
                changed = jnp.any(new != comp)
                return new, changed, it + 1

            comp, _, iters = jax.lax.while_loop(
                cond, body, (comp0, jnp.bool_(True), jnp.int32(0)))
            return comp, iters

        eng._wcc_run = run  # one compile per engine

    start = time.perf_counter()
    comp, iters = run(eng.dev)
    comp.block_until_ready()
    micros = int((time.perf_counter() - start) * 1e6)
    comp = comp.astype(graph.csr_out.targets.dtype
                       if isinstance(graph, DirectedCsrGraph)
                       else graph.csr.targets.dtype)
    return WccResult(components=comp, ran_iterations=int(iters), micros=micros)
