"""Multi-chip EdgeEngine: row-of-edges sharding over a device mesh.

Reference context: the reference is single-process shared-memory only
(SURVEY.md §2 parallelism inventory); its multi-core story is rayon +
CAS. The TPU-native scale-out story is SPMD over a 1-D mesh:

* the edge list is partitioned into one EdgePlan per device (any edge
  partition is valid — segment sums add, segment mins combine),
* every plan is padded to the same section/block counts so the stacked
  plan arrays shard along a leading mesh axis,
* x (scores / labels / distances) is replicated; each device runs the
  K1/K2 kernels on its shard; `psum` (sum) or `pmin`-via-psum-of-bits
  (min) merges the per-device y partials over ICI.

This keeps all per-edge traffic local to each chip; the only collective
is one n-sized reduction per iteration — the same structure as the
reference's "one shared atomic scores array" but with the cache-fabric
traffic replaced by an explicit ICI all-reduce.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graph_tpu.engine.engine import EdgeEngine
from graph_tpu.engine.kernels import BLK, SEC
from graph_tpu.engine.plan import build_plan


class ShardedEdgeEngine:
    """EdgeEngine sharded over a 1-D mesh axis ("edges")."""

    def __init__(self, engines, mesh: Mesh, axis: str = "edges",
                 interpret: bool = False):
        assert len(engines) == len(mesh.devices.flat)
        self.mesh = mesh
        self.axis = axis
        self.template = engines[0]
        self.template.interpret = interpret
        # per-device window-class splits differ in shape, so the stacked
        # engine runs one class (the shared plan win) on every device
        win = self.template.plan.win
        nslices = self.template.plan.nslices
        for e in engines:
            # every device runs the template's compiled kernel: a plan
            # with a larger window would silently lose contributions
            # (widx rows >= win/128 never match the K1 scan)
            if e.plan.win != win or e.plan.nslices != nslices:
                raise ValueError(
                    f"all sharded plans must share (win, nslices)="
                    f"({win}, {nslices}); got ({e.plan.win}, "
                    f"{e.plan.nslices}) — build them via "
                    "ShardedEdgeEngine.build or pass win=/nslices=")
        for e in engines:
            e.k1_wins = [win]
            e.dev = {k: v for k, v in e.dev.items()
                     if not (k.startswith("border") and k != "border")}
            e.dev[f"border{win}"] = e.dev["border"]
        # stack per-device plan arrays along a leading axis
        devs = [e.dev for e in engines]
        self.dev_stacked = {
            k: jnp.stack([d[k] for d in devs]) for k in devs[0]
        }

    @classmethod
    def build(cls, src, dst, n, mesh: Mesh, values=None, axis: str = "edges",
              interpret: bool = False):
        """Partition edges contiguously and build one plan per device."""
        src = np.asarray(src)
        dst = np.asarray(dst)
        ndev = len(mesh.devices.flat)
        m = src.size
        bounds = [(m * d) // ndev for d in range(ndev + 1)]
        plans = []
        for d in range(ndev):
            lo, hi = bounds[d], bounds[d + 1]
            v = None if values is None else np.asarray(values)[lo:hi]
            # all shards must share the K1 window (the kernel is
            # compiled once); let the first shard's auto-pick decide
            w = None if d == 0 else plans[0].win
            ns = None if d == 0 else plans[0].nslices
            plans.append(build_plan(src[lo:hi], dst[lo:hi], n, values=v,
                                    win=w, nslices=ns))
        nsec = max(p.nsec for p in plans)
        plans = [_pad_plan(p, nsec) for p in plans]
        engines = [EdgeEngine(p, interpret=interpret) for p in plans]
        return cls(engines, mesh, axis=axis, interpret=interpret)

    def _sharded(self, fn_name):
        tpl = self.template
        axis = self.axis

        def run(dev_stacked, x):
            dev = {k: v[0] for k, v in dev_stacked.items()}
            y = getattr(tpl, fn_name)(dev, x)
            if fn_name == "spmv_dev":
                return jax.lax.psum(y, axis)
            return jax.lax.pmin(y, axis)

        in_specs = ({k: P(axis) for k in self.dev_stacked}, P())
        return shard_map(run, mesh=self.mesh, in_specs=in_specs,
                         out_specs=P(), check_vma=False)

    def spmv(self, x):
        """Replicated x -> replicated y = A^T x, edges sharded."""
        return self._sharded("spmv_dev")(self.dev_stacked, x)

    def smin(self, x):
        return self._sharded("smin_dev")(self.dev_stacked, x)

    def relax(self, dist):
        return self._sharded("relax_dev")(self.dev_stacked, dist)


def _pad_plan(plan, nsec):
    """Pad a plan with empty (all-pad) sections up to ``nsec``."""
    import dataclasses

    from graph_tpu.engine.kernels import MID

    extra = nsec - plan.nsec
    if extra == 0:
        # still add the trash mid so out shapes match across devices
        return dataclasses.replace(plan, nmid=plan.nmid + 1)
    add_slots = extra * SEC
    nslots = plan.nslots + add_slots
    widx = np.vstack([plan.widx,
                      np.zeros((add_slots // 128, 128), np.uint16)])
    ws = np.concatenate([plan.ws, np.zeros(add_slots // 1024, np.uint8)])
    from graph_tpu.engine.plan import _block_dtype

    sb = np.concatenate(
        [plan.sb.astype(np.int64),
         np.zeros(add_slots // BLK, np.int64)])
    bdt = _block_dtype(sb.size)
    border = np.argsort(sb, kind="stable").astype(bdt)
    sb = sb.astype(bdt)
    weights = plan.weights
    if weights is not None:
        weights = np.vstack([weights,
                             np.zeros((add_slots // 128, 128), np.float32)])
    # routing for an all-pad section: identity stages, all slots padded,
    # no present destinations (route-2 outputs fully masked)
    pad_keys = np.full(SEC, MID, np.int32)
    pad_keys[0] = -1
    from graph_tpu.engine.plan import _section_python

    wa_s, wb_s, ss_s, wa2_s, wb2_s = _section_python(pad_keys)
    wa = np.vstack([plan.wa] + [wa_s] * extra)
    wb = np.vstack([plan.wb] + [wb_s] * extra)
    sstart = np.vstack([plan.sstart] + [ss_s] * extra)
    wa2 = np.vstack([plan.wa2] + [wa2_s] * extra)
    wb2 = np.vstack([plan.wb2] + [wb2_s] * extra)
    # pad sections write a dedicated trash mid (one extra out block,
    # dropped by the y[:n] slice); the kernel's first-flag comes from
    # the sec_mid change
    sec_mid = np.concatenate([plan.sec_mid,
                              np.full(extra, plan.nmid, np.int32)])
    return dataclasses.replace(
        plan, nslots=nslots, nsec=nsec, nmid=plan.nmid + 1, widx=widx,
        ws=ws, sb=sb, border=border, weights=weights, wa=wa, wb=wb,
        sstart=sstart, wa2=wa2, wb2=wb2, sec_mid=sec_mid)
