"""EdgeEngine — plan-compiled sparse edge traversal for TPUs.

The reference's hot loops are per-edge random gathers/scatters
(page_rank.rs:143-146 gather of in-neighbor scores; dss.rs:148-150 CAS
unions; sssp.rs:184-202 CAS-min relaxations).  TPUs have no vector
gather/scatter, so this package replaces them with a *plan* compiled
once per graph:

* edges are laid out sorted by (dst-block, src) with padding so every
  1024-edge tile reads x through a small sliding window (vectorized
  8-way select gather on the VPU),
* per 64K-edge section, a build-time-routed Benes permutation network
  (lane/sublane `take_along_axis` stages + two in-VMEM transposes)
  sorts contributions by destination inside VMEM,
* segment sums come from an in-VMEM fixed-point cumulative sum plus a
  monotone window compaction into per-destination cells.

See PERF_NOTES.md for the measured primitive rates that force this
design.
"""

from graph_tpu.engine.route import clos_route, clos_apply_reference

__all__ = ["clos_route", "clos_apply_reference", "EdgeEngine",
           "EdgePlan", "OocEdgeEngine"]


def __getattr__(name):  # lazy: engine/ooc pull in jax at import time
    if name == "EdgeEngine":
        from graph_tpu.engine.engine import EdgeEngine

        return EdgeEngine
    if name == "EdgePlan":
        from graph_tpu.engine.plan import EdgePlan

        return EdgePlan
    if name == "OocEdgeEngine":
        from graph_tpu.engine.ooc import OocEdgeEngine

        return OocEdgeEngine
    raise AttributeError(name)
