"""graph_tpu — a TPU-native graph-analytics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``neo4j-labs/graph`` Rust workspace (graph_builder + graph + graph_app +
graph_server + graph_mate).  Graphs are pytrees of device arrays (CSR),
algorithms are jitted pure functions, parallelism is expressed as
shardings over a :class:`jax.sharding.Mesh` instead of threads/atomics.

Layer map (mirrors reference crates, see SURVEY.md):

* :mod:`graph_tpu.graph`    — CSR storage + device-side construction
  (reference: crates/builder/src/graph/csr.rs)
* :mod:`graph_tpu.io`       — edge-list / graph500 / .graph / binary inputs
  (reference: crates/builder/src/input/)
* :mod:`graph_tpu.algos`    — PageRank, WCC, SSSP, triangle count
  (reference: crates/algos/src/)
* :mod:`graph_tpu.parallel` — multi-chip shardings (no reference analog;
  the reference is single-process shared-memory only)
* :mod:`graph_tpu.api`      — ``Graph`` / ``DiGraph`` user API
  (reference: crates/mate/)
* :mod:`graph_tpu.server`   — Arrow Flight service
  (reference: crates/server/)
"""

from graph_tpu.errors import GraphError, InvalidIdType, InvalidNodeValues
from graph_tpu.graph.csr import (
    Csr,
    CsrLayout,
    DirectedCsrGraph,
    UndirectedCsrGraph,
)
from graph_tpu.graph.build import (
    build_directed,
    build_undirected,
    build_undirected_host,
    csr_from_coo,
)
from graph_tpu.builder import GraphBuilder
from graph_tpu.algos import (
    DeltaSteppingConfig,
    PageRankConfig,
    WccConfig,
    delta_stepping,
    global_triangle_count,
    page_rank,
    wcc,
    wcc_afforest,
    wcc_afforest_dss,
    wcc_baseline,
)

__version__ = "0.1.0"

__all__ = [
    "Csr",
    "CsrLayout",
    "DirectedCsrGraph",
    "UndirectedCsrGraph",
    "GraphBuilder",
    "GraphError",
    "InvalidIdType",
    "InvalidNodeValues",
    "build_directed",
    "build_undirected",
    "build_undirected_host",
    "csr_from_coo",
    "load_graph500",
    "PageRankConfig",
    "WccConfig",
    "DeltaSteppingConfig",
    "page_rank",
    "wcc",
    "wcc_baseline",
    "wcc_afforest",
    "wcc_afforest_dss",
    "delta_stepping",
    "global_triangle_count",
    "EdgeEngine",
    "EdgePlan",
    "build_plan",
]

# EdgeEngine: plan-compiled vectorized edge traversal (see PERF_NOTES.md)
from graph_tpu.engine.engine import EdgeEngine
from graph_tpu.engine.plan import EdgePlan, build_plan
from graph_tpu.io.datasets import load_graph500


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default
    ~/.cache/graph_tpu/jax).  Remote TPU compiles cost 20-60 s per
    program shape here; the cache amortizes them across processes.
    Called by the CLI / bench / server entry points; library users can
    call it (or configure JAX themselves).  No-op if already set.
    """
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/graph_tpu/jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
