"""EdgeEngine — apply a compiled EdgePlan on device.

``engine.spmv(x)`` computes ``y[d] = sum over edges (s -> d) of x[s]``
(optionally edge-weighted later), entirely with the vectorized K1/K2
Pallas kernels.  This is the TPU-native replacement for the reference's
pull loop (crates/algos/src/page_rank.rs:143-146).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graph_tpu.engine.kernels import k1_gather, k2_reduce
from graph_tpu.engine.plan import EdgePlan, build_plan


class EdgeEngine:
    """Device-resident compiled edge-traversal plan."""

    def __init__(self, plan: EdgePlan, interpret: bool = False):
        self.plan = plan
        self.interpret = interpret
        self.dev = plan.device_arrays()

    @classmethod
    def build(cls, src, dst, n, values=None, colorer=None,
              interpret: bool = False):
        return cls(build_plan(np.asarray(src), np.asarray(dst), n,
                              values=values, colorer=colorer),
                   interpret=interpret)

    def spmv(self, x: jax.Array) -> jax.Array:
        """y[d] = sum_{(s,d) in E} x[s]; x: (n,) f32 -> y: (n,) f32.

        Segment sums must stay below 2**(31-FIXED_BITS) in magnitude
        (PageRank contributions sum to <= 1 per node, well within).

        NOTE: closes over the plan's device arrays — fine for eager use
        or small graphs, but inside a jit the arrays become embedded
        constants.  For large graphs use :meth:`spmv_dev` and pass
        ``self.dev`` through the jit arguments.
        """
        return self.spmv_dev(self.dev, x)

    def spmv_dev(self, dev, x: jax.Array) -> jax.Array:
        """Functional spmv: plan arrays passed explicitly (jit-arg safe)."""
        p = self.plan
        xp = jnp.zeros(p.nx, jnp.float32).at[: p.n].set(x)
        contrib = k1_gather(xp, dev["widx"], dev["border"], dev["sb"],
                            dev["ws"], interpret=self.interpret)
        y_mids = k2_reduce(contrib, dev["wa"], dev["wb"], dev["cidx"],
                           dev["meta"], dev["sec_mid"], p.nmid,
                           interpret=self.interpret)
        from graph_tpu.engine.kernels import FIXED_BITS

        y = y_mids.reshape(-1)[: p.n]
        return y.astype(jnp.float32) / jnp.float32(1 << FIXED_BITS)

    def relax(self, dist: jax.Array) -> jax.Array:
        """y[d] = min over weighted edges (s -> d) of dist[s] + w.

        The tropical-semiring SpMV: one Bellman-Ford relaxation round,
        replacing the reference's CAS-min loop (sssp.rs:184-202).
        Requires the plan to have been built with edge values.
        """
        return self.relax_dev(self.dev, dist)

    def relax_dev(self, dev, dist: jax.Array) -> jax.Array:
        from graph_tpu.engine.kernels import INF

        p = self.plan
        xp = jnp.full(p.nx, INF, jnp.float32).at[: p.n].set(dist)
        contrib = k1_gather(xp, dev["widx"], dev["border"], dev["sb"],
                            dev["ws"], weights=dev["weights"], combine="add",
                            interpret=self.interpret)
        y_mids = k2_reduce(contrib, dev["wa"], dev["wb"], dev["cidx"],
                           dev["meta"], dev["sec_mid"], p.nmid, op="min",
                           sstart=dev["sstart"], interpret=self.interpret)
        y = y_mids.reshape(-1)[: p.n]
        return jax.lax.bitcast_convert_type(y, jnp.float32)

    def smin(self, x: jax.Array) -> jax.Array:
        """y[d] = min over edges (s -> d) of x[s]; empty rows get +3e38.

        Values must be exact in f32 (component labels up to 2**24 are).
        """
        return self.smin_dev(self.dev, x)

    def smin_dev(self, dev, x: jax.Array) -> jax.Array:
        from graph_tpu.engine.kernels import INF

        p = self.plan
        xp = jnp.full(p.nx, INF, jnp.float32).at[: p.n].set(x)
        contrib = k1_gather(xp, dev["widx"], dev["border"], dev["sb"],
                            dev["ws"], interpret=self.interpret)
        y_mids = k2_reduce(contrib, dev["wa"], dev["wb"], dev["cidx"],
                           dev["meta"], dev["sec_mid"], p.nmid, op="min",
                           sstart=dev["sstart"], interpret=self.interpret)
        y = y_mids.reshape(-1)[: p.n]
        return jax.lax.bitcast_convert_type(y, jnp.float32)




# ---------------------------------------------------------------------------
# Per-graph engine cache.  Graph pytrees hold jax arrays (unhashable),
# so key by object identity and evict via weakref finalizers.

_GRAPH_ENGINES = {}


def engine_for(graph, kind: str, build_fn):
    """Return a cached engine for (graph, kind), building on first use."""
    import weakref

    key = (id(graph), kind)
    eng = _GRAPH_ENGINES.get(key)
    if eng is None:
        eng = build_fn()
        _GRAPH_ENGINES[key] = eng
        try:
            weakref.finalize(graph, _GRAPH_ENGINES.pop, key, None)
        except TypeError:
            pass
    return eng
