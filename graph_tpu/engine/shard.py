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

import dataclasses

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
            if e.plan.lm is not None:
                raise ValueError(
                    "sharded plans must be built with lanemap=False "
                    "(the stacked kernel decodes widx positionally)")
        for e in engines:
            e.k1_cls = [(win, "rowscan")]  # valid for any placement
            e.k2_classes = None  # per-device class splits differ in shape
            e.dev = {k: v for k, v in e.dev.items()
                     if not (k.startswith("border") and k != "border")
                     and not k.startswith(("k2sel", "k2cls"))}
            e.dev[f"border{win}_rowscan"] = e.dev["border"]
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
            # lanemap=False: the stacked single-class kernel decodes
            # widx positionally on every device
            plans.append(build_plan(src[lo:hi], dst[lo:hi], n, values=v,
                                    win=w, nslices=ns, lanemap=False))
        nsec = max(p.nsec for p in plans)
        nx = max(p.nx for p in plans)  # the template's nx must cover all
        plans = [dataclasses.replace(_pad_plan(p, nsec), nx=nx)
                 for p in plans]
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


class RowBlockEdgeEngine:
    """Row-block (destination-partitioned) sharded EdgeEngine.

    The round-2 ``ShardedEdgeEngine`` partitions by edge ranges with a
    replicated x and a full n-sized psum per iteration; this engine is
    the SURVEY §7 phase-4 design: each device owns ``rows_per`` node
    rows and the in-edges pointing at them, exchanges only the ragged
    boundary segments over ICI (:mod:`graph_tpu.parallel.halo`), and
    runs the K1/K2 Pallas kernels on a plan whose gather side indexes
    the halo buffer directly (a *rectangular* plan: n = rows_per
    destinations, n_src = P*H halo positions).  Destinations are owned
    by exactly one device, so there is no output collective at all —
    per-destination int32 fixed-point sums are bit-identical to the
    single-device engine.

    The halo buffer is also an active-source compression: each chip
    gathers from a dense list of the sources it actually references,
    so K1 window classes collapse like a degree relabel does.
    """

    def __init__(self, engines, send_idx, mesh: Mesh, axis: str,
                 rows_per: int, node_count: int, interpret: bool = False,
                 halo_bytes: int = 0, gather_bytes: int = 0):
        assert len(engines) == len(mesh.devices.flat)
        self.mesh = mesh
        self.axis = axis
        self.rows_per = rows_per
        self.node_count = node_count
        self.halo_bytes = halo_bytes
        self.gather_bytes = gather_bytes
        self.template = engines[0]
        self.template.interpret = interpret
        win = self.template.plan.win
        nslices = self.template.plan.nslices
        for e in engines:
            if e.plan.win != win or e.plan.nslices != nslices:
                raise ValueError(
                    "all row-block plans must share (win, nslices); build "
                    "them via RowBlockEdgeEngine.build")
            if e.plan.lm is not None:
                raise ValueError(
                    "row-block plans must be built with lanemap=False "
                    "(the stacked kernel decodes widx positionally)")
            e.k1_cls = [(win, "rowscan")]  # valid for any placement
            e.k2_classes = None  # per-device class splits differ in shape
            e.dev = {k: v for k, v in e.dev.items()
                     if not (k.startswith("border") and k != "border")
                     and not k.startswith(("k2sel", "k2cls"))}
            e.dev[f"border{win}_rowscan"] = e.dev["border"]
        devs = [e.dev for e in engines]
        self.dev_stacked = {
            k: jnp.stack([d[k] for d in devs]) for k in devs[0]
        }
        # (P, P, H): what each chip sends to each peer, local row ids
        self.dev_stacked["send_idx"] = jnp.asarray(send_idx)
        self._place()

    def _place(self):
        """Shard the stacked plan arrays along the leading device axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P(self.axis))
        self.dev_stacked = {
            k: jax.device_put(v, sh) for k, v in self.dev_stacked.items()
        }

    @classmethod
    def build(cls, src, dst, n, mesh: Mesh, values=None,
              axis: str = "nodes", interpret: bool = False):
        """Partition by destination row block and compile the halo."""
        from graph_tpu.parallel.halo import build_halo

        src = np.asarray(src)
        dst = np.asarray(dst)
        P_ = len(mesh.devices.flat)
        rows_per = -(-n // P_)
        owner = dst // rows_per
        order = np.argsort(owner, kind="stable")
        src_s, dst_s = src[order], dst[order]
        val_s = None if values is None else np.asarray(values)[order]
        starts = np.searchsorted(owner[order], np.arange(P_ + 1))
        counts = np.diff(starts)
        m_pad = max(int(counts.max()), 1)
        # build_halo wants the (P, m_pad) matrix of GLOBAL source ids
        tgt = np.zeros((P_, m_pad), dtype=src_s.dtype)
        for p in range(P_):
            tgt[p, : counts[p]] = src_s[starts[p]:starts[p + 1]]
        halo = build_halo(tgt, counts, rows_per)
        n_src = P_ * halo.H

        plans = []
        for p in range(P_):
            lo, hi = starts[p], starts[p + 1]
            v = None if val_s is None else val_s[lo:hi]
            w = None if p == 0 else plans[0].win
            ns = None if p == 0 else plans[0].nslices
            plans.append(build_plan(
                halo.tgt_remap[p, : counts[p]].astype(np.int64),
                (dst_s[lo:hi] - p * rows_per).astype(np.int64),
                rows_per, values=v, win=w, nslices=ns, n_src=n_src,
                lanemap=False))
        nsec = max(p_.nsec for p_ in plans)
        nx = max(p_.nx for p_ in plans)  # template's nx pads x for all
        plans = [dataclasses.replace(_pad_plan(p_, nsec), nx=nx)
                 for p_ in plans]
        engines = [EdgeEngine(p_, interpret=interpret) for p_ in plans]
        return cls(engines, halo.send_idx, mesh, axis, rows_per, n,
                   interpret=interpret, halo_bytes=halo.halo_bytes,
                   gather_bytes=halo.gather_bytes)

    # -- building blocks for drivers (used inside their shard_map loops)

    def local_dev(self, dev_stacked):
        """Strip the leading shard axis inside ``shard_map``."""
        return {k: v[0] for k, v in dev_stacked.items() if k != "send_idx"}

    # -- one-shot sharded ops (x and y are global row-sharded vectors)

    def _run(self, fn_name, x, **kw):
        from graph_tpu.parallel.halo import exchange

        tpl = self.template
        axis = self.axis
        n_pad = self.rows_per * len(self.mesh.devices.flat)
        fill, dt = {"spmv_dev": (0.0, jnp.float32),
                    "smin_dev": (3.0e38, jnp.float32),
                    "relax_dev": (3.0e38, jnp.float32),
                    "smin_int_dev": (2**31 - 1, jnp.int32)}[fn_name]
        xp = jnp.full((n_pad,), fill, dt).at[: self.node_count].set(x)

        # memoize the jitted shard_map per op (a fresh object per call
        # would re-pay the 20-60 s remote compile, VERDICT round-2 #3)
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        key = (fn_name, tuple(sorted(kw.items())))
        mapped = cache.get(key)
        if mapped is None:
            def run(dev_stacked, xs):
                dev = self.local_dev(dev_stacked)
                halo = exchange(xs[0], dev_stacked["send_idx"][0], axis)
                y = getattr(tpl, fn_name)(dev, halo, **kw)
                return y[None]

            mapped = jax.jit(shard_map(
                run, mesh=self.mesh,
                in_specs=({k: P(axis) for k in self.dev_stacked}, P(axis)),
                out_specs=P(axis), check_vma=False))
            cache[key] = mapped
        y = mapped(self.dev_stacked, xp.reshape(len(self.mesh.devices.flat),
                                                self.rows_per))
        return y.reshape(-1)[: self.node_count]

    def spmv(self, x):
        """y = A^T x with x/y row-sharded; bit-identical to the
        single-device engine (per-destination sums are device-local)."""
        return self._run("spmv_dev", x)

    def smin(self, x):
        return self._run("smin_dev", x)

    def smin_int(self, x):
        return self._run("smin_int_dev", x)

    def relax(self, dist):
        return self._run("relax_dev", dist)


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
