"""EdgePlan — build-time layout compiler for the EdgeEngine.

Turns an edge list into the padded slot stream + routing metadata that
:mod:`graph_tpu.engine.kernels` consumes.  All conflict resolution the
reference performs at runtime with atomics (csr.rs:154-172 scatter,
dss.rs:148-150 CAS) happens here, once per graph, on the host.

Layout (constants shared with kernels.py):

* Edges are sorted by (mid, src) where mid = dst // 65536.
* The slot stream is the edge list plus pads:
    - every 65536-slot section starts with one lead pad (sort key -1,
      guarantees cumsum position 0 is zero),
    - tiles (1024 slots) are cut early when the src span would exceed
      the K1 gather window; blocks (16 tiles) when it would exceed the
      x-slice pair,
    - every mid is padded to a whole number of sections.
* K1 metadata: per-block x-slice index (sb), per-tile window start
  (ws), per-slot slice-local src (widx, uint16), and a slice-major
  block visit order (border) so x slices stream through VMEM once.
* K2 metadata: per-section packed Benes routing (wa, wb), compaction
  cell indices (cidx), window starts / counts (meta), section mid ids.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import numpy as np

from graph_tpu.engine import route as _route
from graph_tpu.engine.kernels import (
    BLK, BLOCK_SPAN, MID, NSLICES, SEC, SEC_R, SLICE, SPAN_BUDGET, TILE,
    TPB, WIN,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EdgePlan:
    """Host-side plan; `device_arrays()` uploads once."""

    n: int
    m: int
    nslots: int
    nmid: int
    nsec: int
    nx: int  # padded x length (multiple of SLICE, covers all slices + 1)
    # K1
    widx: np.ndarray     # (nslots//128, 128) uint16
    sb: np.ndarray       # (nblocks,) int32
    ws: np.ndarray       # (ntiles,) int32
    border: np.ndarray   # (nblocks,) int32 grid order
    weights: "np.ndarray | None"  # (nslots//128, 128) f32 per-slot weights
    # K2
    wa: np.ndarray       # (nsec*512, 128) uint16
    wb: np.ndarray       # (nsec*512, 128) uint16
    cidx: np.ndarray     # (nsec*512, 128) uint16
    sstart: np.ndarray   # (nsec*512, 128) uint16 segment-start positions
    meta: np.ndarray     # (nsec*129,) int32
    sec_mid: np.ndarray  # (nsec,) int32

    def save(self, path: str) -> None:
        """Snapshot the plan (same discipline as the reference's binary
        graph serialization, csr.rs:252-314: dtype-checked arrays +
        scalar header)."""
        np.savez(
            path,
            __header__=np.array([self.n, self.m, self.nslots, self.nmid,
                                 self.nsec, self.nx], np.int64),
            widx=self.widx, sb=self.sb, ws=self.ws, border=self.border,
            weights=(np.zeros(0, np.float32) if self.weights is None
                     else self.weights),
            wa=self.wa, wb=self.wb, cidx=self.cidx, sstart=self.sstart,
            meta=self.meta, sec_mid=self.sec_mid,
        )

    @staticmethod
    def load(path: str) -> "EdgePlan":
        z = np.load(path)
        h = z["__header__"]
        w = z["weights"]
        return EdgePlan(
            n=int(h[0]), m=int(h[1]), nslots=int(h[2]), nmid=int(h[3]),
            nsec=int(h[4]), nx=int(h[5]),
            widx=z["widx"], sb=z["sb"], ws=z["ws"], border=z["border"],
            weights=None if w.size == 0 else w,
            wa=z["wa"], wb=z["wb"], cidx=z["cidx"], sstart=z["sstart"],
            meta=z["meta"], sec_mid=z["sec_mid"],
        )

    def device_arrays(self):
        import jax.numpy as jnp

        out = {} if self.weights is None else {
            "weights": jnp.asarray(self.weights)}
        out.update({
            "widx": jnp.asarray(self.widx),
            "sb": jnp.asarray(self.sb),
            "ws": jnp.asarray(self.ws),
            "border": jnp.asarray(self.border),
            "wa": jnp.asarray(self.wa),
            "wb": jnp.asarray(self.wb),
            "cidx": jnp.asarray(self.cidx),
            "sstart": jnp.asarray(self.sstart),
            "meta": jnp.asarray(self.meta),
            "sec_mid": jnp.asarray(self.sec_mid),
        })
        return out


def build_plan(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    values: Optional[np.ndarray] = None,
    colorer=None,
) -> EdgePlan:
    """Compile an edge list into an EdgePlan.

    src, dst: (m,) integer arrays (the plan gathers x[src] and reduces
    into y[dst]).  `colorer` optionally overrides the bipartite
    edge-coloring (native C++ implementation); defaults to the python
    one in graph_tpu.engine.route.
    """
    t0 = time.perf_counter()
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    m = src.size
    nmid = max(1, -(-n // MID))

    if colorer is None:
        plan = _build_plan_native(src, dst, n, values, m, nmid, t0)
        if plan is not None:
            return plan

    order = np.lexsort((src, dst // MID))
    src_s = src[order]
    mid_s = (dst[order] // MID).astype(np.int64)
    dstl_s = (dst[order] - mid_s * MID).astype(np.int64)
    val_s = None if values is None else np.asarray(values, np.float32)[order]

    mid_starts = np.searchsorted(mid_s, np.arange(nmid + 1))

    # ---- slot stream layout (per mid)
    tile_srcs: list = []       # per tile: array of real srcs or None
    tile_pads: list = []       # per tile: (ntail, lead, _)
    tile_dstl: list = []
    tile_eidx: list = []       # per tile: slice (lo_edge, hi_edge) into order
    slot = 0
    sec_mid_list = []
    for mi in range(nmid):
        lo, hi = mid_starts[mi], mid_starts[mi + 1]
        t_start = len(tile_srcs)
        s0 = slot
        slot = _layout_mid_with_dst(
            src_s[lo:hi], dstl_s[lo:hi], tile_srcs, tile_pads, tile_dstl, s0,
            tile_eidx, lo)
        nsec_i = (slot - s0) // SEC
        sec_mid_list.extend([mi] * nsec_i)
    nslots = slot
    ntiles = nslots // TILE
    nblocks = ntiles // TPB
    nsec = nslots // SEC
    assert len(tile_srcs) == ntiles

    # ---- K1 arrays
    widx_flat = np.zeros(nslots, np.uint16)
    wvals = None
    if val_s is not None:
        wvals = np.zeros(nslots, np.float32)
        pos_w = 0
        for t in range(ntiles):
            srcs = tile_srcs[t]
            lead = tile_pads[t][1]
            if srcs is not None and srcs.size:
                elo, ehi = tile_eidx[t]
                wvals[pos_w + lead: pos_w + lead + srcs.size] = val_s[elo:ehi]
            pos_w += TILE
    slot_dstl = np.zeros(nslots, np.int32)  # -1 lead, MID tail/pads
    ws = np.zeros(ntiles, np.int32)
    sb = np.zeros(nblocks, np.int32)
    pos = 0
    for t in range(ntiles):
        srcs = tile_srcs[t]
        ntail, lead, _ = tile_pads[t]
        b = t // TPB
        if t % TPB == 0:
            # block slice from the first real src in the block
            bfirst = None
            for tt in range(t, min(t + TPB, ntiles)):
                if tile_srcs[tt] is not None and tile_srcs[tt].size:
                    bfirst = tile_srcs[tt][0]
                    break
            sb[b] = 0 if bfirst is None else bfirst // SLICE
        base = sb[b] * SLICE
        if srcs is not None and srcs.size:
            first_local = srcs[0] - base
            ws[t] = min((first_local // 1024) * 1024, NSLICES * SLICE - WIN)
        else:
            ws[t] = 0
        fill = np.zeros(TILE, np.int64)  # pads gather window slot 0
        dloc = np.full(TILE, MID, np.int32)
        off = lead
        if srcs is not None and srcs.size:
            fill[off:off + srcs.size] = srcs - base - ws[t]
            dloc[off:off + srcs.size] = tile_dstl[t]
        if lead:
            dloc[0] = -1
        widx_flat[pos:pos + TILE] = fill.astype(np.uint16)
        slot_dstl[pos:pos + TILE] = dloc
        pos += TILE

    # slice-major block visit order (stream x through VMEM once)
    border = np.argsort(sb, kind="stable").astype(np.int32)

    # ---- K2 per-section routing (native C++ when available)
    sec_mid_arr = np.asarray(sec_mid_list, np.int32)
    first_flags = np.ones(nsec, np.int32)
    if nsec > 1:
        first_flags[1:] = (sec_mid_arr[1:] != sec_mid_arr[:-1]).astype(np.int32)
    native = None
    if colorer is None:
        from graph_tpu.engine.native_route import build_sections_native

        native = build_sections_native(slot_dstl)
    if native is not None:
        wa_f, wb_f, cidx_f, sstart_f, ws2_f, nsub_f = native
        wa = wa_f.reshape(nsec * SEC_R, 128)
        wb = wb_f.reshape(nsec * SEC_R, 128)
        cidx = cidx_f.reshape(nsec * SEC_R, 128)
        sstart = sstart_f.reshape(nsec * SEC_R, 128)
        meta = np.zeros(nsec * 129, np.int32)
        mv = meta.reshape(nsec, 129)
        mv[:, 0] = first_flags
        mv[:, 1:65] = ws2_f.reshape(nsec, 64)
        mv[:, 65:129] = nsub_f.reshape(nsec, 64)
    else:
        wa = np.zeros((nsec * SEC_R, 128), np.uint16)
        wb = np.zeros((nsec * SEC_R, 128), np.uint16)
        cidx = np.zeros((nsec * SEC_R, 128), np.uint16)
        sstart = np.zeros((nsec * SEC_R, 128), np.uint16)
        meta = np.zeros(nsec * 129, np.int32)
        for s in range(nsec):
            keys = slot_dstl[s * SEC:(s + 1) * SEC]
            wa_s, wb_s, ci_s, ss_s, ws2_s, nsub_s = _section_python(
                keys, colorer)
            meta_s = np.zeros(129, np.int32)
            meta_s[0] = first_flags[s]
            meta_s[1:65] = ws2_s
            meta_s[65:129] = nsub_s
            wa[s * SEC_R:(s + 1) * SEC_R] = wa_s
            wb[s * SEC_R:(s + 1) * SEC_R] = wb_s
            cidx[s * SEC_R:(s + 1) * SEC_R] = ci_s
            sstart[s * SEC_R:(s + 1) * SEC_R] = ss_s
            meta[s * 129:(s + 1) * 129] = meta_s

    nx = (max(int(sb.max()) + NSLICES if nblocks else NSLICES,
              -(-n // SLICE) + 1)) * SLICE
    plan = EdgePlan(
        n=n, m=m, nslots=nslots, nmid=nmid, nsec=nsec, nx=nx,
        widx=widx_flat.reshape(-1, 128), sb=sb, ws=ws, border=border,
        weights=None if wvals is None else wvals.reshape(-1, 128),
        wa=wa, wb=wb, cidx=cidx, sstart=sstart, meta=meta,
        sec_mid=sec_mid_arr,
    )
    logger.info(
        "EdgePlan: m=%d slots=%d (%.1f%% pad) mids=%d sections=%d in %.2fs",
        m, nslots, 100.0 * (nslots - m) / max(1, nslots), nmid, nsec,
        time.perf_counter() - t0,
    )
    return plan


def _layout_mid_with_dst(src, dstl, out_src, out_pad, out_dstl, slot0,
                         out_eidx=None, edge_base=0):
    """Greedy layout; also records per-tile (lo, hi) edge-index ranges."""
    m_i = src.size
    cur = 0
    slot = slot0
    block_first = -1
    while True:
        if cur >= m_i and slot % SEC == 0 and slot > slot0:
            break
        if cur >= m_i and m_i == 0 and slot == slot0:
            pass  # emit at least one full pad section
        lead = 1 if slot % SEC == 0 else 0
        if slot % BLK == 0:
            block_first = -1
        cap = TILE - lead
        if cur >= m_i:
            out_src.append(None)
            out_pad.append((TILE - lead, lead, None))
            out_dstl.append(None)
            if out_eidx is not None:
                out_eidx.append((0, 0))
            slot += TILE
            if slot % SEC == 0:
                break
            continue
        first = src[cur]
        if block_first < 0:
            block_first = first
        block_base = (block_first // SLICE) * SLICE
        if first - block_base > BLOCK_SPAN:
            out_src.append(None)
            out_pad.append((TILE - lead, lead, None))
            out_dstl.append(None)
            if out_eidx is not None:
                out_eidx.append((0, 0))
            slot += TILE
            continue
        hi_span = min(first + SPAN_BUDGET, block_base + BLOCK_SPAN)
        hi = np.searchsorted(src, hi_span, side="right")
        k = min(cap, hi - cur)
        out_src.append(src[cur:cur + k])
        out_dstl.append(dstl[cur:cur + k])
        out_pad.append((TILE - lead - k, lead, None))
        if out_eidx is not None:
            out_eidx.append((edge_base + cur, edge_base + cur + k))
        cur += k
        slot += TILE
    return slot


def _build_plan_native(src, dst, n, values, m, nmid, t0):
    """Full native-layout path: C++ sort+layout, C++ section routing."""
    from graph_tpu.engine.native_route import (
        build_layout_native, build_sections_native)

    lay = build_layout_native(src, dst, values, n)
    if lay is None:
        return None
    nslots = lay["nslots"]
    nsec = nslots // SEC
    native = build_sections_native(lay["keys"])
    if native is None:
        return None
    wa_f, wb_f, cidx_f, sstart_f, ws2_f, nsub_f = native
    sec_mid_arr = lay["sec_mid"]
    first_flags = np.ones(nsec, np.int32)
    if nsec > 1:
        first_flags[1:] = (sec_mid_arr[1:] != sec_mid_arr[:-1]).astype(np.int32)
    meta = np.zeros(nsec * 129, np.int32)
    mv = meta.reshape(nsec, 129)
    mv[:, 0] = first_flags
    mv[:, 1:65] = ws2_f.reshape(nsec, 64)
    mv[:, 65:129] = nsub_f.reshape(nsec, 64)
    sb = lay["sb"]
    border = np.argsort(sb, kind="stable").astype(np.int32)
    nx = (max(int(sb.max()) + NSLICES if sb.size else NSLICES,
              -(-n // SLICE) + 1)) * SLICE
    wvals = lay["wvals"]
    plan = EdgePlan(
        n=n, m=m, nslots=nslots, nmid=lay["nmid"], nsec=nsec, nx=nx,
        widx=lay["widx"].reshape(-1, 128), sb=sb, ws=lay["ws"], border=border,
        weights=None if wvals is None else wvals.reshape(-1, 128),
        wa=wa_f.reshape(nsec * SEC_R, 128),
        wb=wb_f.reshape(nsec * SEC_R, 128),
        cidx=cidx_f.reshape(nsec * SEC_R, 128),
        sstart=sstart_f.reshape(nsec * SEC_R, 128),
        meta=meta, sec_mid=sec_mid_arr,
    )
    logger.info(
        "EdgePlan (native): m=%d slots=%d (%.1f%% pad) mids=%d sections=%d "
        "in %.2fs", m, nslots, 100.0 * (nslots - m) / max(1, nslots),
        lay["nmid"], nsec, time.perf_counter() - t0)
    return plan


def _section_python(keys, colorer=None):
    """Pure-python routing of one section (fallback / pad sections).

    Returns (wa, wb, cidx, sstart, ws2, nsub), shaped for the kernel.
    """
    sort_order = np.argsort(keys, kind="stable")
    target = np.empty(SEC, np.int64)
    target[sort_order] = np.arange(SEC)
    idx = (_route.clos_route(target, SEC_R) if colorer is None
           else colorer(target, SEC_R))
    pad = ((keys == -1) | (keys == MID)).reshape(SEC_R, 128)
    wa_s, wb_s = _route.pack_routing(idx, pad)
    s_key = keys[sort_order]
    ss_s = np.searchsorted(s_key, s_key, side="left")
    e_d = (np.searchsorted(s_key, np.arange(MID), side="right") - 1)
    assert e_d.min() >= 0
    ws2 = np.zeros(64, np.int32)
    nsub = np.zeros(64, np.int32)
    ci = np.zeros(MID, np.uint16)
    for t in range(64):
        seg = e_d[t * 1024:(t + 1) * 1024]
        base = (int(seg.min()) // 1024) * 1024
        ws2[t] = base
        nsub[t] = (int(seg.max()) - base) // 1024 + 1
        ci[t * 1024:(t + 1) * 1024] = seg.astype(np.uint16)
    return (wa_s, wb_s.reshape(SEC_R, 128), ci.reshape(SEC_R, 128),
            ss_s.astype(np.uint16).reshape(SEC_R, 128), ws2, nsub)
