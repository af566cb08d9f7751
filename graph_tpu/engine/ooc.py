"""Out-of-core EdgeEngine: destination-slab streaming for graphs > HBM.

The reference claims "graphs with billions of nodes and edges"
(/root/reference/README.md:24-26) — on a host with enough RAM its
mmap'd CSR just pages.  The TPU analog: device HBM caps the resident
plan, so the edge stream is split into destination-contiguous SLABS,
each compiled as an independent rectangular EdgePlan (reduce domain =
the slab's destination rows, gather domain = all n sources — the same
``n_src`` machinery the row-block sharded engine uses, plan.py).  Per
spmv, slabs stream host -> device one at a time: only ONE slab's plan
arrays (+ the x vector and the slab's y block) are ever resident, so
total graph size is bounded by host RAM, not HBM.

Cost model: plan arrays are ~12.3 B/slot (widx 2 + five routing
streams 10 + metadata), so a spmv pays ~12.3 B/edge of PCIe/host
traffic per iteration — out-of-core is for capacity, not speed.
PageRank amortizes nothing across iterations by design (the slab
upload IS the point: it replaces HBM it doesn't have).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import numpy as np

from graph_tpu.engine.kernels import MID

logger = logging.getLogger(__name__)

#: Approximate resident bytes per slot of a plan's device arrays.
_BYTES_PER_SLOT = 12.3


@dataclasses.dataclass
class _Slab:
    d0: int          # first destination row of this slab
    rows: int        # destination rows (reduce domain)
    plan: object     # EdgePlan with n=rows, n_src=n


class OocEdgeEngine:
    """Sequential destination-slab engine; plans live on the HOST.

    ``spmv(x)`` computes the same y as EdgeEngine.spmv by streaming
    one slab at a time; results are bit-exact per slab (same kernels,
    same int32 fixed-point accumulation) and slabs touch disjoint
    destination rows, so the concatenated y is bit-exact overall.
    """

    def __init__(self, slabs, n: int, m: int, interpret: bool = False):
        from graph_tpu.engine.engine import EdgeEngine

        self.slabs = slabs
        self.n = n
        self.m = m
        self.interpret = interpret
        # EdgeEngine wrappers hold the K1/K2 class structure; device
        # arrays are NOT uploaded here — spmv streams them per call.
        self._engines = [EdgeEngine.__new__(EdgeEngine) for _ in slabs]
        for eng, sl in zip(self._engines, self.slabs):
            eng.plan = sl.plan
            eng.interpret = interpret
            eng.dev = None  # host-resident: no resident device arrays
            eng._fp_in = eng._fp_out = None  # rectangular: no relabel
            from graph_tpu.engine.engine import _k1_classes, _k2_classes

            eng.k1_cls = []
            self_cls = _k1_classes(sl.plan)
            eng._borders = {}
            for win_c, mode_c, border_c in self_cls:
                eng.k1_cls.append((win_c, mode_c))
                eng._borders[f"border{win_c}_{mode_c}"] = border_c
            eng.k2_classes = _k2_classes(sl.plan)
            if eng.k2_classes is not None:
                cls_arr = np.zeros(sl.plan.nsec, np.int32)
                for i, (_, _, ids) in enumerate(eng.k2_classes):
                    cls_arr[ids] = i
                eng._k2cls = cls_arr
                eng.k2_levels = tuple(
                    (ls, rs) for ls, rs, _ in eng.k2_classes)

    @classmethod
    def build(cls, src, dst, n: int, values=None,
              max_bytes: Optional[int] = None,
              n_slabs: Optional[int] = None,
              interpret: bool = False) -> "OocEdgeEngine":
        """Partition edges into destination slabs sized for the budget.

        ``max_bytes``: resident-plan budget per slab (defaults to 2
        GiB — comfortably inside one v5e core's HBM next to x/y).
        Slab boundaries are mid-aligned (the K2 grid reduces whole
        mids).  ``n_slabs`` overrides the computed slab count.
        ``values``: optional (m,) edge weights — enables :meth:`relax`.
        """
        from graph_tpu.engine.plan import build_plan

        t0 = time.perf_counter()
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        m = src.size
        nmid = max(1, -(-n // MID))
        if n_slabs is None:
            budget = max_bytes or (2 << 30)
            est_slots = m * 1.2 + nmid * (1 << 16)
            n_slabs = max(1, int(np.ceil(est_slots * _BYTES_PER_SLOT
                                         / budget)))
        n_slabs = min(n_slabs, nmid)
        # destination-contiguous, mid-aligned slab bounds with ~equal
        # edge counts (power-law dsts skew; equal mid counts would not)
        order = np.argsort(dst, kind="stable")
        src_s, dst_s = src[order], dst[order]
        val_s = (None if values is None
                 else np.asarray(values, np.float32)[order])
        mid_bounds = np.searchsorted(dst_s, np.arange(nmid + 1) * MID)
        per_mid = np.diff(mid_bounds)
        target = m / n_slabs
        cuts = [0]
        acc = 0
        for mi in range(nmid):
            acc += per_mid[mi]
            if acc >= target and len(cuts) < n_slabs:
                cuts.append(mi + 1)
                acc = 0
        cuts.append(nmid)
        slabs = []
        for i in range(len(cuts) - 1):
            mlo, mhi = cuts[i], cuts[i + 1]
            if mlo == mhi:
                continue
            elo, ehi = mid_bounds[mlo], mid_bounds[mhi]
            d0 = mlo * MID
            rows = min(mhi * MID, n) - d0
            plan = build_plan(src_s[elo:ehi], dst_s[elo:ehi] - d0,
                              rows,
                              values=None if val_s is None
                              else val_s[elo:ehi],
                              n_src=n, pair=False)
            slabs.append(_Slab(d0=d0, rows=rows, plan=plan))
        eng = cls(slabs, n=n, m=m, interpret=interpret)
        logger.info(
            "OocEdgeEngine: m=%d rows=%d slabs=%d (max resident "
            "%.0f MB) in %.1fs", m, n, len(slabs),
            max(s.plan.nslots for s in slabs) * _BYTES_PER_SLOT / 1e6,
            time.perf_counter() - t0)
        return eng

    def _slab_dev(self, sl: _Slab, eng):
        """One slab's device arrays, freshly staged from the host."""
        dev = sl.plan.device_arrays()
        for k, v in eng._borders.items():
            import jax.numpy as jnp

            dev[k] = jnp.asarray(v)
        if getattr(eng, "k2_classes", None) is not None:
            import jax.numpy as jnp

            dev["k2cls"] = jnp.asarray(eng._k2cls)
        return dev

    def spmv(self, x, bound: float = 1.0):
        """y[d] = sum over edges (s -> d) of x[s], slab-streamed.

        Returns a HOST numpy array (the y blocks arrive per slab).
        Bit-exact vs EdgeEngine.spmv on the same edges.
        """
        import jax.numpy as jnp

        from graph_tpu.engine.kernels import FIXED_BITS

        x = jnp.asarray(x, jnp.float32)
        if bound != 1.0:
            return np.asarray(
                self.spmv(x * jnp.float32(1.0 / bound))) * np.float32(bound)
        xq = jnp.round(x * jnp.float32(1 << FIXED_BITS)).astype(jnp.int32)
        y = np.zeros(self.n, np.float32)
        for sl, eng in zip(self.slabs, self._engines):
            dev = self._slab_dev(sl, eng)
            xp = jnp.zeros(sl.plan.nx, jnp.int32).at[: self.n].set(xq)
            contrib = eng._k1(dev, xp)
            y_mids = eng._k2(dev, contrib, "sum")
            yb = (np.asarray(y_mids.reshape(-1)[: sl.rows])
                  .astype(np.int32).astype(np.float32)
                  / np.float32(1 << FIXED_BITS))
            y[sl.d0: sl.d0 + sl.rows] = yb
            del dev, contrib, y_mids  # release the slab's HBM
        return y

    def relax(self, dist):
        """y[d] = min over weighted edges (s -> d) of dist[s] + w,
        slab-streamed (one Bellman-Ford relaxation round).  Requires
        the engine to have been built with edge ``values``."""
        import jax.numpy as jnp

        from graph_tpu.engine.kernels import INF, INF_BITS

        if self.slabs and self.slabs[0].plan.weights is None:
            raise ValueError("relax needs an engine built with values")
        dist = jnp.asarray(dist, jnp.float32)
        y = np.full(self.n, INF, np.float32)
        for sl, eng in zip(self.slabs, self._engines):
            dev = self._slab_dev(sl, eng)
            xp = jnp.full(sl.plan.nx, INF, jnp.float32).at[
                : self.n].set(dist)
            contrib = eng._k1(dev, xp, weights=dev["weights"],
                              combine="add")
            y_mids = eng._k2(dev, contrib, "min")
            yb = np.asarray(y_mids.reshape(-1)[: sl.rows]).view(np.float32)
            y[sl.d0: sl.d0 + sl.rows] = yb
            del dev, contrib, y_mids
        return y

    def smin_int(self, x):
        """y[d] = min over edges (s -> d) of int32 x[s], slab-streamed.

        Empty rows get 2**31-1.  Bit-exact vs EdgeEngine.smin_int."""
        import jax.numpy as jnp

        from graph_tpu.engine.kernels import IMAX

        x = jnp.asarray(x, jnp.int32)
        y = np.full(self.n, IMAX, np.int32)
        for sl, eng in zip(self.slabs, self._engines):
            dev = self._slab_dev(sl, eng)
            xp = jnp.full(sl.plan.nx, IMAX, jnp.int32).at[: self.n].set(x)
            contrib = eng._k1(dev, xp, pair_op="min")
            y_mids = eng._k2(dev, contrib, "imin")
            y[sl.d0: sl.d0 + sl.rows] = np.asarray(
                y_mids.reshape(-1)[: sl.rows])
            del dev, contrib, y_mids
        return y


def wcc_ooc(src, dst, n: int, *, max_bytes: Optional[int] = None,
            n_slabs: Optional[int] = None, interpret: bool = False):
    """Weakly connected components on an out-of-core graph.

    Min-label propagation with pointer jumping (same algorithm as
    algos/wcc.py plan path) over slab-streamed symmetrized edges;
    labels are int32 node ids, host-resident between rounds.  Returns
    the (n,) component labels.
    """
    from graph_tpu.dtypes import check_node_count_fits

    check_node_count_fits(n, np.int32)
    sym_src = np.concatenate([np.asarray(src), np.asarray(dst)])
    sym_dst = np.concatenate([np.asarray(dst), np.asarray(src)])
    eng = OocEdgeEngine.build(sym_src, sym_dst, n, max_bytes=max_bytes,
                              n_slabs=n_slabs, interpret=interpret)
    comp = np.arange(n, dtype=np.int32)
    while True:
        new = np.minimum(comp, eng.smin_int(comp))
        new = new[new]  # pointer jump (squares chains)
        new = new[new]
        if np.array_equal(new, comp):
            return comp
        comp = new


def sssp_ooc(src, dst, values, n: int, start_node: int = 0, *,
             max_bytes: Optional[int] = None,
             n_slabs: Optional[int] = None, interpret: bool = False):
    """Single-source shortest paths on an out-of-core weighted graph.

    Bellman-Ford to fixpoint with slab-streamed relaxation rounds
    (host-resident distances between rounds; same semantics as the
    plan engine's SSSP path).  Returns the (n,) float32 distances,
    unreached nodes at the engine's +inf stand-in (~3e38).
    """
    from graph_tpu.engine.kernels import INF

    eng = OocEdgeEngine.build(src, dst, n, values=values,
                              max_bytes=max_bytes, n_slabs=n_slabs,
                              interpret=interpret)
    dist = np.full(n, INF, np.float32)
    dist[start_node] = 0.0
    while True:
        new = np.minimum(dist, eng.relax(dist))
        if np.array_equal(new, dist):
            return dist
        dist = new


def page_rank_ooc(src, dst, n: int, *, max_iterations: int = 20,
                  damping: float = 0.85, tolerance: float = 1e-4,
                  max_bytes: Optional[int] = None,
                  n_slabs: Optional[int] = None,
                  interpret: bool = False):
    """Jacobi PageRank on an out-of-core graph (edge arrays on host).

    Reference bar: page_rank semantics (crates/algos/src/page_rank.rs:
    45-47) on graphs whose plan exceeds device memory.  Returns
    (scores, iterations, err).
    """
    eng = OocEdgeEngine.build(src, dst, n, max_bytes=max_bytes,
                              n_slabs=n_slabs, interpret=interpret)
    outdeg = np.bincount(np.asarray(src), minlength=n).astype(np.float32)
    inv_outdeg = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1.0),
                          0.0).astype(np.float32)
    base = np.float32((1.0 - damping) / n)
    scores = np.full(n, 1.0 / n, np.float32)
    err = np.float32(0)
    it = 0
    for it in range(1, max_iterations + 1):
        y = eng.spmv(scores * inv_outdeg)
        new = base + np.float32(damping) * y
        err = np.abs(new - scores).sum()
        scores = new
        if err < tolerance:
            break
    return scores, it, float(err)
