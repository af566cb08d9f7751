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
* K2 metadata: per-section packed Benes routing into destination-sorted
  order (wa, wb), segment-start positions for the in-kernel segmented
  scan (sstart), a second packed Benes route moving each destination's
  segment-end value to its output position with a per-output present
  bit (wa2, wb2), and section mid ids.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import numpy as np

from graph_tpu.engine import route as _route
from graph_tpu.engine.kernels import (
    BLK, BLOCK_SPAN, MID, NSLICES, SEC, SEC_R, SLICE, TILE, TPB, WIN,
)

logger = logging.getLogger(__name__)

#: Default (pad) window position per tile slot: its VREG row * 128 —
#: row-conformal for the row-matched K1 mode and always < win.
_ROWPAT = ((np.arange(TILE) // 128) * 128).astype(np.int64)


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
    win: int             # per-graph K1 gather window (power of two)
    nslices: int         # x slices staged per block (block-span budget)
    widx: np.ndarray     # (nslots//128, 128) uint16
    sb: np.ndarray       # (nblocks,) uint16/int32 (see _block_dtype)
    ws: np.ndarray       # (ntiles,) uint8/uint16: window start / 1024
    #   (uint8 when nslices*SLICE - win fits 255 KiB; wide-slice configs
    #    like (16384, 16) need uint16 — the kernel upcasts either way)
    border: np.ndarray   # (nblocks,) uint16/int32 grid order
    weights: "np.ndarray | None"  # (nslots//128, 128) f32 per-slot weights
    # K2
    wa: np.ndarray       # (nsec*512, 128) uint16 route 1 (bit15: input pad)
    wb: np.ndarray       # (nsec*512, 128) uint16
    sstart: np.ndarray   # (nsec*512, 128) uint16 segment-start positions
    wa2: np.ndarray      # (nsec*512, 128) uint16 route 2 (bit15: present)
    wb2: np.ndarray      # (nsec*512, 128) uint16
    sec_mid: np.ndarray  # (nsec,) int32
    # degree relabel (optional): the plan was built on perm[src]->perm[dst]
    # and its spmv/smin operate in relabeled space; perm maps ORIGINAL
    # node id -> internal id (descending out-degree).  Hot sources then
    # share K1 gather windows, so the per-block window classes collapse
    # to few scan rows where the edges are (see engine._k1_classes).
    perm: "np.ndarray | None" = None  # (n,) int32 or None
    # rectangular plans (optional): gather domain size when it differs
    # from the reduce domain ``n`` — the row-block sharded engine
    # gathers from a (P*H,) halo buffer while reducing into its own
    # rows_per destinations.  0 means square (n_src == n).
    n_src: int = 0
    # lanemap blocks (optional): per-block mask of tiles repacked into
    # the lane-mapped widx encoding (kernels mode="lanemap"; see
    # graph_tpu.engine.lanemap).  None = no block is lane-mapped.
    lm: "np.ndarray | None" = None  # (nblocks,) uint8 or None
    # two-table lanemap blocks (optional, round 4): blocks pass 1
    # rejected but a second row table rescues (kernels mode="lanemap2").
    # wt2 is the full table-2 stream, read only for these blocks.
    lm2: "np.ndarray | None" = None  # (nblocks,) uint8 or None
    wt2: "np.ndarray | None" = None  # (nslots//128, 128) uint8 or None
    # hub-pair blocks (optional, round 4): one slot carries TWO same-
    # destination hub edges; K1 gathers both via independent lanemap
    # streams (widx + widx2) and emits their sum/min (kernels
    # mode="pair"; layout in graph_tpu.engine.pair).  widx2 is the full
    # stream-2 array, read only for pair blocks.
    pm: "np.ndarray | None" = None     # (nblocks,) uint8 or None
    widx2: "np.ndarray | None" = None  # (nslots//128, 128) uint16 or None
    # hub-quad blocks (round 5): one slot carries FOUR same-destination
    # hub edges through four lanemap streams (kernels mode="quad";
    # widx2 doubles as quad stream 2, widx3/widx4 are streams 3/4,
    # read only for quad blocks).
    qm: "np.ndarray | None" = None     # (nblocks,) uint8 or None
    widx3: "np.ndarray | None" = None  # (nslots//128, 128) uint16 or None
    widx4: "np.ndarray | None" = None  # (nslots//128, 128) uint16 or None

    @property
    def nsrc(self) -> int:
        return self.n_src or self.n

    FORMAT_VERSION = 12  # v12: max-row-sorted pair/quad placement
    # (small-window compressed classes);
    # v11: hub-quad blocks (qm/widx3/widx4);
    # v10: hub-pair blocks (pm/widx2);
    # v9: two-table lanemap (lm2/wt2) + 9-bit
    # tables for win-65536 plans;
    # v8: 8-bit lanemap row table at bits 7..14
    # (windows up to 32768);
    # v7: lanemap tile packing (K1 lanemap classes);
    # v6: row-matched tile placement (K1 rowmatch);
    # v5: optional degree-relabel perm;
    # v4: per-plan nslices (block-span budget);
    # v3: uint16 sb/border (SMEM prefetch limit at scale 24+);
    # v2: compaction replaced by route 2

    def save(self, path: str) -> None:
        """Snapshot the plan (same discipline as the reference's binary
        graph serialization, csr.rs:252-314: dtype-checked arrays +
        scalar header)."""
        np.savez(
            path,
            __header__=np.array([self.n, self.m, self.nslots, self.nmid,
                                 self.nsec, self.nx, self.FORMAT_VERSION,
                                 self.win, self.nslices, self.n_src],
                                np.int64),
            widx=self.widx, sb=self.sb, ws=self.ws,
            border=self.border,
            weights=(np.zeros(0, np.float32) if self.weights is None
                     else self.weights),
            wa=self.wa, wb=self.wb, sstart=self.sstart,
            wa2=self.wa2, wb2=self.wb2, sec_mid=self.sec_mid,
            perm=(np.zeros(0, np.int32) if self.perm is None
                  else self.perm),
            lm=(np.zeros(0, np.uint8) if self.lm is None
                else self.lm.astype(np.uint8)),
            lm2=(np.zeros(0, np.uint8) if self.lm2 is None
                 else self.lm2.astype(np.uint8)),
            wt2=(np.zeros(0, np.uint8) if self.wt2 is None
                 else self.wt2),
            pm=(np.zeros(0, np.uint8) if self.pm is None
                else self.pm.astype(np.uint8)),
            widx2=(np.zeros(0, np.uint16) if self.widx2 is None
                   else self.widx2),
            qm=(np.zeros(0, np.uint8) if self.qm is None
                else self.qm.astype(np.uint8)),
            widx3=(np.zeros(0, np.uint16) if self.widx3 is None
                   else self.widx3),
            widx4=(np.zeros(0, np.uint16) if self.widx4 is None
                   else self.widx4),
        )

    @staticmethod
    def load(path: str) -> "EdgePlan":
        z = np.load(path)
        h = z["__header__"]
        if h.size < 7 or int(h[6]) != EdgePlan.FORMAT_VERSION:
            raise ValueError(
                f"{path}: plan format "
                f"{int(h[6]) if h.size > 6 else 1} != "
                f"{EdgePlan.FORMAT_VERSION}; rebuild the plan")
        w = z["weights"]
        perm = z["perm"] if "perm" in z.files else np.zeros(0, np.int32)
        lm = z["lm"] if "lm" in z.files else np.zeros(0, np.uint8)
        lm2 = z["lm2"] if "lm2" in z.files else np.zeros(0, np.uint8)
        wt2 = z["wt2"] if "wt2" in z.files else np.zeros(0, np.uint8)
        pm = z["pm"] if "pm" in z.files else np.zeros(0, np.uint8)
        widx2 = z["widx2"] if "widx2" in z.files else np.zeros(0, np.uint16)
        qm = z["qm"] if "qm" in z.files else np.zeros(0, np.uint8)
        widx3 = z["widx3"] if "widx3" in z.files else np.zeros(0, np.uint16)
        widx4 = z["widx4"] if "widx4" in z.files else np.zeros(0, np.uint16)
        return EdgePlan(
            n=int(h[0]), m=int(h[1]), nslots=int(h[2]), nmid=int(h[3]),
            nsec=int(h[4]), nx=int(h[5]), win=int(h[7]),
            nslices=int(h[8]),
            widx=z["widx"], sb=z["sb"], ws=z["ws"],
            border=z["border"],
            weights=None if w.size == 0 else w,
            wa=z["wa"], wb=z["wb"], sstart=z["sstart"],
            wa2=z["wa2"], wb2=z["wb2"], sec_mid=z["sec_mid"],
            perm=None if perm.size == 0 else perm,
            n_src=int(h[9]) if h.size > 9 else 0,
            lm=None if lm.size == 0 else lm,
            lm2=None if lm2.size == 0 else lm2,
            wt2=None if wt2.size == 0 else wt2,
            pm=None if pm.size == 0 else pm,
            widx2=None if widx2.size == 0 else widx2,
            qm=None if qm.size == 0 else qm,
            widx3=None if widx3.size == 0 else widx3,
            widx4=None if widx4.size == 0 else widx4,
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
            "sstart": jnp.asarray(self.sstart),
            "wa2": jnp.asarray(self.wa2),
            "wb2": jnp.asarray(self.wb2),
            "sec_mid": jnp.asarray(self.sec_mid),
        })
        if self.perm is not None:
            iperm = np.empty_like(self.perm)
            iperm[self.perm] = np.arange(self.n, dtype=self.perm.dtype)
            out["perm"] = jnp.asarray(self.perm)
            out["iperm"] = jnp.asarray(iperm)
        if self.wt2 is not None:
            out["wt2"] = jnp.asarray(self.wt2)
        if self.widx2 is not None:
            out["widx2"] = jnp.asarray(self.widx2)
        if self.widx3 is not None:
            out["widx3"] = jnp.asarray(self.widx3)
            out["widx4"] = jnp.asarray(self.widx4)
        return out


#: Candidate (window, staged slices) configs.  Smaller windows unroll
#: fewer scan rows (3 VREG ops per row per 1024-slot tile) but split
#: wide tiles into pads; the 16384 window pairs with 8 staged slices
#: because the block-span budget (nslices*SLICE) otherwise binds first
#: at large src gaps (scale 24: gap ~16 -> 16K slots span 262K srcs).
#: WIN_COST_RATIO is the measured ratio of a tile's fixed cost (IO +
#: K2 share) to one window-row scan (~0.12 ns / 0.0024 ns).
#: (16384, 16) listed before (16384, 8) so dict(WIN_CANDIDATES) keeps
#: nslices=8 as the default for an explicit win=16384 request; the
#: auto-pick iterates all entries.  16 staged slices halve the pad at
#: large src gaps (scale 24) and cost almost nothing with the modular
#: x-slice streams (one slice re-fetched per slice-base step).
WIN_CANDIDATES = ((2048, 3), (4096, 3), (8192, 3), (16384, 16),
                  (16384, 8), (32768, 16))
WIN_COST_RATIO = 48


def _ws_dtype(win: int, nslices: int):
    """Narrowest dtype for window starts / 1024 (SMEM prefetch budget);
    the largest start is nslices*SLICE - win (plan layout clamp)."""
    return np.uint8 if (nslices * SLICE - win) // 1024 <= 255 else np.uint16


def _block_dtype(nblocks: int):
    """Narrowest dtype for block ids/indices (SMEM prefetch budget)."""
    return np.uint16 if nblocks < (1 << 16) else np.int32


def pick_win(counts_by_cfg) -> tuple:
    """argmin over (win, nslices) configs of
    ``nslots * WIN_COST_RATIO + rowcost`` where rowcost is the
    per-BLOCK window-class scan rows actually paid (engine._k1_classes
    runs each block at its own class, so a wide window is nearly free
    for blocks with tight spans — the old graph-max model bought 27%
    pad at scale 22 to shrink windows the scan never ran).  Within 5%
    of the minimum, prefer the fewest slots (less HBM/pad).

    counts_by_cfg: {(win, nslices): (nslots, rowcost)}.
    """
    def _argmin(cands):
        costs = {cfg: counts_by_cfg[cfg][0] * WIN_COST_RATIO
                 + counts_by_cfg[cfg][1] for cfg in cands}
        cmin = min(costs.values())
        near = [cfg for cfg, c in costs.items() if c <= cmin * 1.05]
        # fewest slots first; on equal slots prefer fewer staged slices
        # (smaller VMEM scratch, cheaper non-modular fallback)
        return min(near, key=lambda cfg: (counts_by_cfg[cfg][0], cfg[1]))

    base_cands = [cfg for cfg in counts_by_cfg if cfg[0] <= 16384]
    base = _argmin(base_cands or list(counts_by_cfg))
    # The 32768 window only pays when it removes substantial pad: its
    # wider K1 classes cost ~+0.01 ns/slot (measured scale 22, v8 —
    # spmv 0.1515 -> 0.1604 for a 1.7% slot saving) while a slot costs
    # ~0.15 ns end to end, so breakeven is ~7% fewer slots (scale-24
    # pad 27.4% -> 18.2% clears it: spmv/edge 0.252-est -> 0.224).
    wide = [cfg for cfg in counts_by_cfg if cfg[0] > 16384]
    if wide:
        w = min(wide, key=lambda cfg: counts_by_cfg[cfg][0])
        if counts_by_cfg[w][0] < 0.93 * counts_by_cfg[base][0]:
            return w
    return base


def _pair_default() -> bool:
    """Effective hub-pair default: $GRAPH_TPU_PAIR (on unless =0).

    Defaults ON since landing end-to-end: measured on v5e, spmv
    0.1488 -> 0.1227 ns/edge at scale 22 and 0.1241 -> 0.0991 at
    scale 19 (PERF_NOTES round-5), bit-exact vs the unpaired plan
    (tests/test_engine.py::test_plan_paired_engine_exact)."""
    import os

    return os.environ.get("GRAPH_TPU_PAIR", "1") != "0"


def plan_cache_path(cache_dir: str, src, dst, n: int, values=None,
                    tag: str = "", win: int = 0, nslices: int = 0,
                    relabel: "str | None" = None,
                    pair: "bool | None" = None) -> str:
    """Content-addressed cache filename for a plan.

    Keyed on the exact edge arrays (+ values), node count, tag, the
    layout overrides (``win``/``nslices``, 0 = auto-pick), and the plan
    format version — a graph rebuilt from the same inputs reuses its
    compiled plan across processes (VERDICT round-1 weak #4: plan
    builds cost ~minutes at scale 22 and were paid per process).
    Including the overrides keeps a pinned config (e.g. the documented
    wide-window scale-24 setup) from being silently satisfied by a
    cached auto-picked plan (ADVICE round-2).
    """
    import hashlib
    import os

    if pair is None:
        pair = _pair_default()
    from graph_tpu.engine.pair import effective_hub

    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray([n, np.asarray(src).size, EdgePlan.FORMAT_VERSION,
                         win or 0, nslices or 0,
                         (1 if pair else 0)
                         + (2 if pair and _quad_default() else 0),
                         effective_hub() if pair else 0],
                        np.int64).tobytes())
    # NUL separators: concatenated free-form strings must not collide
    # across fields (tag="degree" vs relabel="degree")
    h.update(tag.encode() + b"\0")
    h.update((relabel or "").encode() + b"\0")
    h.update(np.ascontiguousarray(src).tobytes())
    h.update(np.ascontiguousarray(dst).tobytes())
    if values is not None:
        h.update(np.ascontiguousarray(values).tobytes())
    return os.path.join(cache_dir, f"plan-{h.hexdigest()}.npz")


def load_or_build_plan(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    values: Optional[np.ndarray] = None,
    cache_dir: Optional[str] = None,
    **kw,
) -> EdgePlan:
    """:func:`build_plan` with cross-process persistence.

    ``cache_dir`` (or $GRAPH_TPU_PLAN_CACHE) holds content-addressed
    plan snapshots; a hit skips the whole layout+routing build.  The
    reference keeps per-graph state in its server catalog
    (crates/server/src/catalog.rs:148-268); here plans are per-graph
    state that additionally survives the process.
    """
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("GRAPH_TPU_PLAN_CACHE")
    if not cache_dir:
        return build_plan(src, dst, n, values=values, **kw)
    os.makedirs(cache_dir, exist_ok=True)
    req_win = kw.get("win") or 0
    req_nslices = kw.get("nslices") or 0
    path = plan_cache_path(cache_dir, src, dst, n, values=values,
                           win=req_win, nslices=req_nslices,
                           relabel=kw.get("relabel"),
                           pair=kw.get("pair"))
    if os.path.exists(path):
        try:
            plan = EdgePlan.load(path)
            # belt-and-braces: the key includes the overrides, but a
            # hand-copied cache file must still honor an explicit pin
            if (req_win and plan.win != req_win) or (
                    req_nslices and plan.nslices != req_nslices):
                logger.warning(
                    "EdgePlan cache %s has (win=%d, nslices=%d), "
                    "requested (%d, %d); rebuilding", path, plan.win,
                    plan.nslices, req_win, req_nslices)
            else:
                logger.info("EdgePlan cache hit: %s", path)
                return plan
        except Exception as exc:  # stale format: rebuild below
            logger.warning("EdgePlan cache %s unreadable (%s)", path, exc)
    plan = build_plan(src, dst, n, values=values, **kw)
    try:
        plan.save(path)
        logger.info("EdgePlan cached: %s", path)
    except OSError as exc:  # read-only cache dir etc.
        logger.warning("EdgePlan cache write failed (%s)", exc)
    return plan


def build_plan(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    values: Optional[np.ndarray] = None,
    colorer=None,
    win: Optional[int] = None,
    nslices: Optional[int] = None,
    relabel: Optional[str] = None,
    n_src: Optional[int] = None,
    lanemap: Optional[bool] = None,
    pair: Optional[bool] = None,
) -> EdgePlan:
    """Compile an edge list into an EdgePlan.

    src, dst: (m,) integer arrays (the plan gathers x[src] and reduces
    into y[dst]).  `colorer` optionally overrides the bipartite
    edge-coloring (native C++ implementation); defaults to the python
    one in graph_tpu.engine.route.  ``win`` pins the K1 gather window
    (power of two in WIN_CANDIDATES); None auto-selects per graph.

    ``relabel="degree"`` builds the plan on an internal descending
    out-degree node order (the TPU analog of the reference's degree
    relabel, crates/builder/src/graph/csr.rs degree ordering): hot
    sources cluster, so K1's per-block window classes pay few scan rows
    where the edges are.  The engine's public ops transparently permute
    in/out; iterative drivers use the internal space directly.

    ``lanemap``: None follows $GRAPH_TPU_K1_LANEMAP (default on);
    False skips the lanemap tile repack — required by the sharded
    engines, whose stacked single-class kernels assume the positional
    widx encoding on every device.

    ``pair``: None follows $GRAPH_TPU_PAIR (default on).  Hub-pair
    slot compression (graph_tpu.engine.pair): two same-destination hub
    edges share one slot, gathered through two lanemap streams and
    combined in K1 (kernels mode="pair").  Applies only to unweighted
    square degree-relabeled plans; it is a no-op otherwise.
    """
    t0 = time.perf_counter()
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    m = src.size
    nmid = max(1, -(-n // MID))
    if n_src is not None and relabel is not None:
        raise ValueError("relabel and n_src (rectangular plan) are exclusive")

    perm = None
    if relabel == "degree":
        deg = np.bincount(src, minlength=n)
        order = np.argsort(-deg, kind="stable")
        perm = np.empty(n, np.int32)
        perm[order] = np.arange(n, dtype=np.int32)
        src = perm[src].astype(np.int64)
        dst = perm[dst].astype(np.int64)
        nmid = max(1, -(-n // MID))
    elif relabel is not None:
        raise ValueError(f"relabel must be None or 'degree', got {relabel!r}")

    if pair is None:
        pair = _pair_default()
    if (pair and values is None and not n_src and perm is not None
            and lanemap is not False and colorer is None):
        plan = _build_plan_paired(src, dst, n, m, nmid, perm, t0,
                                  win=win, nslices=nslices,
                                  lanemap=lanemap)
        if plan is not None:
            return plan

    if colorer is None:
        plan = _build_plan_native(src, dst, n, values, m, nmid, t0,
                                  win=win or 0, nslices=nslices or 0,
                                  perm=perm, n_src=n_src or 0,
                                  lanemap=lanemap)
        if plan is not None:
            return plan

    order = np.lexsort((src, dst // MID))
    src_s = src[order]
    mid_s = (dst[order] // MID).astype(np.int64)
    dstl_s = (dst[order] - mid_s * MID).astype(np.int64)
    val_s = None if values is None else np.asarray(values, np.float32)[order]

    mid_starts = np.searchsorted(mid_s, np.arange(nmid + 1))

    if win is None:
        counts = {}
        for cand in WIN_CANDIDATES:
            tot_s = tot_r = 0
            for mi in range(nmid):
                s_, r_ = _count_slots(
                    src_s[mid_starts[mi]:mid_starts[mi + 1]],
                    cand[0], cand[1])
                tot_s += s_
                tot_r += r_
            counts[cand] = (tot_s, tot_r)
        win, nslices = pick_win(counts)
    elif nslices is None:
        nslices = dict(WIN_CANDIDATES).get(win, NSLICES)

    # ---- slot stream layout (per mid)
    tile_srcs: list = []       # per tile: array of real srcs or None
    tile_pads: list = []       # per tile: (ntail, lead, _)
    tile_dstl: list = []
    tile_eidx: list = []       # per tile: slice (lo_edge, hi_edge) into order
    tile_pos: list = []        # per tile: row-matched positions or None
    slot = 0
    sec_mid_list = []
    for mi in range(nmid):
        lo, hi = mid_starts[mi], mid_starts[mi + 1]
        t_start = len(tile_srcs)
        s0 = slot
        slot = _layout_mid_with_dst(
            src_s[lo:hi], dstl_s[lo:hi], tile_srcs, tile_pads, tile_dstl, s0,
            tile_eidx, lo, win=win, nslices=nslices, out_pos=tile_pos)
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
                rp = tile_pos[t]
                if rp is None:
                    wvals[pos_w + lead: pos_w + lead + srcs.size] = (
                        val_s[elo:ehi])
                else:
                    wvals[pos_w + rp] = val_s[elo:ehi]
            pos_w += TILE
    slot_dstl = np.zeros(nslots, np.int32)  # -1 lead, MID tail/pads
    ws = np.zeros(ntiles, np.int32)  # stored /1024 as uint8 below
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
            ws[t] = min((first_local // 1024) * 1024, nslices * SLICE - win)
        else:
            ws[t] = 0
        # pads gather window position (row*128): row-conformal (so pad
        # tiles never demote a block from rowmatch mode), always < win
        # (in-bounds).  Pad VALUES are UNMASKED in K2 (the round-3 trim
        # removed the value mask): whatever the gather produces stays
        # inert only because the sorted layout confines pads to their
        # own segments (sort keys -1 / MID) and route 2's present bit
        # masks their outputs — a layout invariant, not a kernel one.
        fill = _ROWPAT.copy()
        dloc = np.full(TILE, MID, np.int32)
        off = lead
        if srcs is not None and srcs.size:
            rp = tile_pos[t]
            if rp is None:
                fill[off:off + srcs.size] = srcs - base - ws[t]
                dloc[off:off + srcs.size] = tile_dstl[t]
            else:
                fill[rp] = srcs - base - ws[t]
                dloc[rp] = tile_dstl[t]
        if lead:
            dloc[0] = -1
        widx_flat[pos:pos + TILE] = fill.astype(np.uint16)
        slot_dstl[pos:pos + TILE] = dloc
        pos += TILE

    # ---- lanemap repack (before routing: it permutes keys in-tile)
    lm, lm2, wt2 = ((None, None, None) if lanemap is False else
                    _lanemap_pass(widx_flat, slot_dstl, wvals, win, nblocks))

    # slice-major block visit order (stream x through VMEM once)
    bdt = _block_dtype(nblocks)
    border = np.argsort(sb, kind="stable").astype(bdt)
    sb = sb.astype(bdt)

    # ---- K2 per-section routing (native C++ when available)
    sec_mid_arr = np.asarray(sec_mid_list, np.int32)
    native = None
    if colorer is None:
        from graph_tpu.engine.native_route import build_sections_native

        native = build_sections_native(slot_dstl)
    if native is not None:
        wa_f, wb_f, sstart_f, wa2_f, wb2_f = native
        wa = wa_f.reshape(nsec * SEC_R, 128)
        wb = wb_f.reshape(nsec * SEC_R, 128)
        sstart = sstart_f.reshape(nsec * SEC_R, 128)
        wa2 = wa2_f.reshape(nsec * SEC_R, 128)
        wb2 = wb2_f.reshape(nsec * SEC_R, 128)
    else:
        wa = np.zeros((nsec * SEC_R, 128), np.uint16)
        wb = np.zeros((nsec * SEC_R, 128), np.uint16)
        sstart = np.zeros((nsec * SEC_R, 128), np.uint16)
        wa2 = np.zeros((nsec * SEC_R, 128), np.uint16)
        wb2 = np.zeros((nsec * SEC_R, 128), np.uint16)
        for s in range(nsec):
            keys = slot_dstl[s * SEC:(s + 1) * SEC]
            wa_s, wb_s, ss_s, wa2_s, wb2_s = _section_python(keys, colorer)
            wa[s * SEC_R:(s + 1) * SEC_R] = wa_s
            wb[s * SEC_R:(s + 1) * SEC_R] = wb_s
            sstart[s * SEC_R:(s + 1) * SEC_R] = ss_s
            wa2[s * SEC_R:(s + 1) * SEC_R] = wa2_s
            wb2[s * SEC_R:(s + 1) * SEC_R] = wb2_s

    nx = (max(int(sb.max()) + nslices if nblocks else nslices,
              -(-(n_src or n) // SLICE) + 1)) * SLICE
    plan = EdgePlan(
        n=n, m=m, nslots=nslots, nmid=nmid, nsec=nsec, nx=nx, win=win,
        nslices=nslices,
        widx=widx_flat.reshape(-1, 128), sb=sb,
        ws=(ws // 1024).astype(_ws_dtype(win, nslices)), border=border,
        weights=None if wvals is None else wvals.reshape(-1, 128),
        wa=wa, wb=wb, sstart=sstart, wa2=wa2, wb2=wb2,
        sec_mid=sec_mid_arr, perm=perm, n_src=n_src or 0, lm=lm,
        lm2=lm2, wt2=wt2,
    )
    logger.info(
        "EdgePlan: m=%d slots=%d (%.1f%% pad) mids=%d sections=%d in %.2fs",
        m, nslots, 100.0 * (nslots - m) / max(1, nslots), nmid, nsec,
        time.perf_counter() - t0,
    )
    return plan


def _lanemap_pass(widx_flat, keys_flat, wvals_flat, win, nblocks):
    """Run the lanemap repacks (graph_tpu.engine.lanemap) in place.

    Returns (lm, lm2, wt2): the per-block uint8 masks for the 1- and
    2-table encodings and the table-2 stream, each None when empty.
    Disabled via $GRAPH_TPU_K1_LANEMAP=0 (both) / =1 (pass 1 only);
    inapplicable when win > 65536 (the row table is 9 bits)."""
    import os

    flag = os.environ.get("GRAPH_TPU_K1_LANEMAP", "2")
    if flag == "0" or win > 65536 or not nblocks:
        return None, None, None
    from graph_tpu.engine.native_route import lanemap_pack_native

    lm_mask = lanemap_pack_native(widx_flat, keys_flat, wvals_flat, win)
    if lm_mask is None:  # no compiler: pure-python fallback
        from graph_tpu.engine.lanemap import lanemap_pack

        lm_mask = lanemap_pack(widx_flat, keys_flat, wvals_flat, win)
    lm2 = wt2 = None
    if flag != "1" and win <= 32768 and not lm_mask.all():
        from graph_tpu.engine.native_route import lanemap2_pack_native

        res = lanemap2_pack_native(widx_flat, keys_flat, wvals_flat, win,
                                   lm_mask)
        if res is None:  # no compiler: pure-python fallback
            from graph_tpu.engine.lanemap import lanemap2_pack

            res = lanemap2_pack(widx_flat, keys_flat, wvals_flat, win,
                                lm_mask)
        lm2_mask, wt2_flat = res
        if wt2_flat is not None and lm2_mask.any():
            lm2 = lm2_mask.astype(np.uint8)
            wt2 = wt2_flat.reshape(-1, 128)
    lm = lm_mask.astype(np.uint8) if lm_mask.any() else None
    return lm, lm2, wt2


def _rowmatch_positions(idxs, k, lead):
    """Try the row-matched placement for a tile's candidate slots.

    idxs: (k,) window-local positions (src - base - ws_t), ascending.
    Returns (k_rm, pos) — the longest prefix whose slots fit the
    per-VREG-row capacity (row i takes only slots with (idx>>7)&7 == i,
    128 per row, minus the lead pad in row 0) and their positions
    within the tile, or (0, None) when even the first slot cannot be
    placed.  Duplicate-heavy (hub) runs overflow a single row quickly,
    so callers fall back to the packed order when k_rm is small."""
    r3 = (idxs[:k] >> 7) & 7
    k_rm = k
    for c in range(8):
        cap = 128 - (lead if c == 0 else 0)
        occ = np.nonzero(r3 == c)[0]
        if occ.size > cap:
            k_rm = min(k_rm, int(occ[cap]))
    if k_rm <= 0:
        return 0, None
    r = r3[:k_rm]
    order = np.argsort(r, kind="stable")
    rs = r[order]
    counts = np.bincount(rs, minlength=8)
    starts = np.cumsum(counts) - counts
    rank = np.arange(k_rm) - starts[rs]
    pos_sorted = rs * 128 + rank + np.where(rs == 0, lead, 0)
    pos = np.empty(k_rm, np.int64)
    pos[order] = pos_sorted
    return k_rm, pos


def _layout_mid_with_dst(src, dstl, out_src, out_pad, out_dstl, slot0,
                         out_eidx=None, edge_base=0, win=WIN,
                         nslices=NSLICES, out_pos=None):
    """Greedy layout; also records per-tile (lo, hi) edge-index ranges.

    ``out_pos`` (when given) collects the per-tile slot positions: an
    int array for row-matched tiles (slot i of the tile's src list sits
    at tile position pos[i]; see kernels._k1_kernel mode="rowmatch"),
    or None for the packed order.  Row-matching trades a few unfilled
    positions for an ~8x cheaper K1 gather, so a tile accepts it when
    the saved scan rows beat the pad cost (WIN_COST_RATIO units); hub
    tiles (long duplicate runs overflow one VREG row) stay packed, and
    once a tile of a block goes packed the rest of the block follows
    (the engine classes blocks whole)."""
    span_budget = win - 1024  # worst-case room above a 1024-aligned start
    block_span = nslices * SLICE - 1
    m_i = src.size
    cur = 0
    slot = slot0
    block_first = -1
    rm_allowed = True

    def _pad_tile(lead):
        out_src.append(None)
        out_pad.append((TILE - lead, lead, None))
        out_dstl.append(None)
        if out_eidx is not None:
            out_eidx.append((0, 0))
        if out_pos is not None:
            out_pos.append(None)

    while True:
        if cur >= m_i and slot % SEC == 0 and slot > slot0:
            break
        if cur >= m_i and m_i == 0 and slot == slot0:
            pass  # emit at least one full pad section
        lead = 1 if slot % SEC == 0 else 0
        if slot % BLK == 0:
            block_first = -1
            rm_allowed = True
        cap = TILE - lead
        if cur >= m_i:
            _pad_tile(lead)
            slot += TILE
            if slot % SEC == 0:
                break
            continue
        first = src[cur]
        if block_first < 0:
            block_first = first
        block_base = (block_first // SLICE) * SLICE
        if first - block_base > block_span:
            _pad_tile(lead)
            slot += TILE
            continue
        hi_span = min(first + span_budget, block_base + block_span)
        hi = np.searchsorted(src, hi_span, side="right")
        k = min(cap, hi - cur)
        pos = None
        if out_pos is not None and rm_allowed:
            ws_t = min(((first - block_base) // 1024) * 1024,
                       nslices * SLICE - win)
            idxs = src[cur:cur + k] - block_base - ws_t
            k_rm, pos = _rowmatch_positions(idxs, k, lead)
            if k_rm:
                # accept iff saved scan rows beat the extra pad cost
                rows = int(idxs[k - 1]) // 128 + 1
                saved = rows - -(-rows // 8)
                if k_rm * saved < (k - k_rm) * WIN_COST_RATIO:
                    pos = None
            else:
                pos = None
            if pos is not None:
                k = k_rm
            else:
                rm_allowed = False
        out_src.append(src[cur:cur + k])
        out_dstl.append(dstl[cur:cur + k])
        out_pad.append((TILE - lead - k, lead, None))
        if out_eidx is not None:
            out_eidx.append((edge_base + cur, edge_base + cur + k))
        if out_pos is not None:
            out_pos.append(pos)
        cur += k
        slot += TILE
    return slot


def _class_rows(rows: int, win: int) -> int:
    """Per-block window class in scan rows (mirrors engine._k1_classes:
    1024-slot granularity, i.e. multiples of 8 rows, capped at win/128)."""
    c = max(8, -(-rows // 8) * 8)
    return min(c, win // 128)


def _count_slots(src_sorted, win, nslices=NSLICES):
    """Count-only replica of :func:`_layout_mid_with_dst` for one mid.

    Returns (slots, rowcost) where rowcost sums BLK * class_rows over
    the mid's K1 blocks — the same units the native layout reports.
    Row-matched blocks pay ~class_rows/8 (one lane taa per 8-row window
    group), mirroring the layout's per-tile row-match decision so the
    window auto-pick prices what the kernels will actually run."""
    span_budget = win - 1024
    block_span = nslices * SLICE - 1
    m_i = src_sorted.size
    cur = 0
    slot = 0
    block_first = -1
    block_rows = 0
    block_rm = True
    rm_allowed = True
    rowcost = 0

    def _flush(rows, rm):
        # Row-matched blocks pay ~c/8 (one lane taa per 8-row window
        # group).  Packed blocks are priced at 2x that, NOT the full
        # rowscan c: the lanemap repack (plan v7+) claims ~80% of them
        # at ~c/12 and the rest pay c, so E[cost] ~ 0.25 c ~ 2*(c/8).
        # Flattening the row term shifts the auto-pick toward wide
        # windows (less pad), which is right now that the window scan
        # is no longer the dominant K1 term.
        c = _class_rows(rows, win)
        return BLK * (-(-c // 8) if rm else min(c, 2 * -(-c // 8)))

    while True:
        if cur >= m_i and slot % SEC == 0 and slot > 0:
            break
        lead = 1 if slot % SEC == 0 else 0
        if slot % BLK == 0:
            if slot > 0:
                rowcost += _flush(block_rows, block_rm)
                block_rows = 0
            block_first = -1
            block_rm = True
            rm_allowed = True
        if cur >= m_i:
            slot += TILE
            if slot % SEC == 0:
                break
            continue
        first = src_sorted[cur]
        if block_first < 0:
            block_first = first
        block_base = (block_first // SLICE) * SLICE
        if first - block_base > block_span:
            slot += TILE
            continue
        hi_span = min(first + span_budget, block_base + block_span)
        hi = np.searchsorted(src_sorted, hi_span, side="right")
        k = min(TILE - lead, hi - cur)
        ws_t = min(((first - block_base) // 1024) * 1024,
                   nslices * SLICE - win)
        idxs = src_sorted[cur:cur + k] - block_base - ws_t
        use_rm = False
        if rm_allowed:
            k_rm, _pos = _rowmatch_positions(idxs, k, lead)
            if k_rm:
                rows = int(idxs[k - 1]) // 128 + 1
                saved = rows - -(-rows // 8)
                if k_rm * saved >= (k - k_rm) * WIN_COST_RATIO:
                    use_rm = True
                    k = k_rm
            if not use_rm:
                rm_allowed = False
        if not use_rm:
            block_rm = False
        rows = int(idxs[k - 1]) // 128 + 1
        block_rows = max(block_rows, rows)
        cur += k
        slot += TILE
    if slot > 0:
        rowcost += _flush(block_rows, block_rm)
    return slot, rowcost


def _build_plan_native(src, dst, n, values, m, nmid, t0, win=0, nslices=0,
                       perm=None, n_src=0, lanemap=None):
    """Full native-layout path: C++ sort+layout, C++ section routing."""
    from graph_tpu.engine.native_route import (
        build_layout_native, build_sections_native)

    lay = build_layout_native(src, dst, values, n, win=win, nslices=nslices,
                              n_src=n_src)
    if lay is None:
        return None
    nslots = lay["nslots"]
    nsec = nslots // SEC
    lm, lm2, wt2 = ((None, None, None) if lanemap is False else
                    _lanemap_pass(lay["widx"], lay["keys"], lay["wvals"],
                                  lay["win"], nslots // BLK))
    native = build_sections_native(lay["keys"])
    if native is None:
        return None
    wa_f, wb_f, sstart_f, wa2_f, wb2_f = native
    sec_mid_arr = lay["sec_mid"]
    sb = lay["sb"]
    bdt = _block_dtype(sb.size)
    border = np.argsort(sb, kind="stable").astype(bdt)
    nsl = lay["nslices"]
    nx = (max(int(sb.max()) + nsl if sb.size else nsl,
              -(-(n_src or n) // SLICE) + 1)) * SLICE
    sb = sb.astype(bdt)
    wvals = lay["wvals"]
    plan = EdgePlan(
        n=n, m=m, nslots=nslots, nmid=lay["nmid"], nsec=nsec, nx=nx,
        win=lay["win"], nslices=nsl,
        widx=lay["widx"].reshape(-1, 128), sb=sb,
        ws=(lay["ws"] // 1024).astype(_ws_dtype(lay["win"], nsl)),
        border=border,
        weights=None if wvals is None else wvals.reshape(-1, 128),
        wa=wa_f.reshape(nsec * SEC_R, 128),
        wb=wb_f.reshape(nsec * SEC_R, 128),
        sstart=sstart_f.reshape(nsec * SEC_R, 128),
        wa2=wa2_f.reshape(nsec * SEC_R, 128),
        wb2=wb2_f.reshape(nsec * SEC_R, 128),
        sec_mid=sec_mid_arr, perm=perm, n_src=n_src, lm=lm,
        lm2=lm2, wt2=wt2,
    )
    logger.info(
        "EdgePlan (native): m=%d slots=%d (%.1f%% pad) mids=%d sections=%d "
        "in %.2fs", m, nslots, 100.0 * (nslots - m) / max(1, nslots),
        lay["nmid"], nsec, time.perf_counter() - t0)
    return plan


def _quad_default() -> bool:
    """Effective hub-quad default: $GRAPH_TPU_QUAD (on unless =0)."""
    import os

    return os.environ.get("GRAPH_TPU_QUAD", "1") != "0"


def _build_plan_paired(src, dst, n, m, nmid, perm, t0, win=None,
                       nslices=None, lanemap=None):
    """Hub-compressed plan (v10/v11): rest edges via the native layout,
    per-mid QUAD and PAIR regions spliced in at section granularity.

    Four (or two) same-destination hub edges share one slot
    (graph_tpu.engine.pair); K1 gathers the sources through
    independent lanemap streams (kernels mode="quad"/"pair") and emits
    their combine, so K2 routes and scans fewer slots.  The reference
    has no analog — it visits every edge individually
    (crates/algos/src/page_rank.rs:143-146).

    Returns None (caller falls back to the uncompressed path) when
    nothing pairs, the native toolchain is missing, or the base layout
    is not per-mid monotone.
    """
    from graph_tpu.engine import pair as _pair
    from graph_tpu.engine.native_route import build_sections_native

    if _quad_default():
        q, dq, r1_src, r1_dst = _pair.split_quads(src, dst, n)
    else:
        q = np.zeros((4, 0), np.int64)
        dq = np.zeros(0, np.int64)
        r1_src, r1_dst = src, dst
    s1, s2, d, rest_src, rest_dst = _pair.split_pairs(r1_src, r1_dst, n)
    if s1.size == 0 and q.shape[1] == 0:
        return None
    base = _build_plan_native(rest_src, rest_dst, n, None,
                              int(rest_src.size), nmid, t0,
                              win=win or 0, nslices=nslices or 0,
                              perm=perm, n_src=0, lanemap=lanemap)
    if base is None:
        return None
    smid = base.sec_mid.astype(np.int64)
    if smid.size and not (np.diff(smid) >= 0).all():
        logger.warning("compressed plan: base sections not mid-monotone; "
                       "falling back to the uncompressed plan")
        return None
    sec_lo = np.searchsorted(smid, np.arange(nmid))
    sec_hi = np.searchsorted(smid, np.arange(nmid), side="right")
    pmid = (d // MID).astype(np.int64)
    dstl_p = (d - pmid * MID).astype(np.int32)
    p_starts = np.searchsorted(pmid, np.arange(nmid + 1))
    qmid = (dq // MID).astype(np.int64)
    dstl_q = (dq - qmid * MID).astype(np.int32)
    q_starts = np.searchsorted(qmid, np.arange(nmid + 1))
    has_quads = q.shape[1] > 0

    ROWS = SEC // 128   # widx/routing rows per section
    TPS = SEC // TILE   # tiles per section
    BPS = SEC // BLK    # blocks per section
    base_lm = (base.lm if base.lm is not None
               else np.zeros(base.sb.size, np.uint8))
    base_lm2 = (base.lm2 if base.lm2 is not None
                else np.zeros(base.sb.size, np.uint8))

    widx_l, widx2_l, widx3_l, widx4_l, wt2_l = [], [], [], [], []
    ws_l, sb_l = [], []
    lm_l, lm2_l, pm_l, qm_l, secmid_l = [], [], [], [], []
    comp_keys = []     # pair+quad region keys, in stream order
    chunk_kinds = []   # ("base"|"comp", nsec) interleave for routing

    def _zrows(nsec_c):
        return np.zeros((nsec_c * ROWS, 128), np.uint16)

    def _comp_common(nsec_c, nb, keys, is_quad):
        if base.wt2 is not None:
            wt2_l.append(np.zeros((nsec_c * ROWS, 128), np.uint8))
        ws_l.append(np.zeros(nsec_c * TPS, base.ws.dtype))
        sb_l.append(np.zeros(nb, base.sb.dtype))
        lm_l.append(np.zeros(nb, np.uint8))
        lm2_l.append(np.zeros(nb, np.uint8))
        pm_l.append(np.zeros(nb, np.uint8) if is_quad
                    else np.ones(nb, np.uint8))
        qm_l.append(np.ones(nb, np.uint8) if is_quad
                    else np.zeros(nb, np.uint8))
        secmid_l.append(np.full(nsec_c, mi, np.int32))
        chunk_kinds.append(("comp", nsec_c))
        comp_keys.append(keys)

    for mi in range(nmid):
        lo, hi = int(sec_lo[mi]), int(sec_hi[mi])
        nb = (hi - lo) * BPS
        widx_l.append(base.widx[lo * ROWS:hi * ROWS])
        widx2_l.append(_zrows(hi - lo))
        if has_quads:
            widx3_l.append(_zrows(hi - lo))
            widx4_l.append(_zrows(hi - lo))
        if base.wt2 is not None:
            wt2_l.append(base.wt2[lo * ROWS:hi * ROWS])
        ws_l.append(base.ws[lo * TPS:hi * TPS])
        sb_l.append(base.sb[lo * BPS:hi * BPS])
        lm_l.append(base_lm[lo * BPS:hi * BPS])
        lm2_l.append(base_lm2[lo * BPS:hi * BPS])
        pm_l.append(np.zeros(nb, np.uint8))
        qm_l.append(np.zeros(nb, np.uint8))
        secmid_l.append(np.full(hi - lo, mi, np.int32))
        chunk_kinds.append(("base", hi - lo))
        qlo, qhi = int(q_starts[mi]), int(q_starts[mi + 1])
        if qhi > qlo:
            w1, w2, w3, w4, qkeys, nbq = _pair.quad_mid_layout(
                q[:, qlo:qhi].astype(np.int64), dstl_q[qlo:qhi])
            nsec_q = nbq // BPS
            widx_l.append(w1.astype(np.uint16))
            widx2_l.append(w2.astype(np.uint16))
            widx3_l.append(w3.astype(np.uint16))
            widx4_l.append(w4.astype(np.uint16))
            _comp_common(nsec_q, nbq, qkeys, is_quad=True)
        plo, phi = int(p_starts[mi]), int(p_starts[mi + 1])
        if phi > plo:
            pw, pw2, pkeys, nbp = _pair.pair_mid_layout(
                s1[plo:phi].astype(np.int64), s2[plo:phi].astype(np.int64),
                dstl_p[plo:phi])
            nsec_p = nbp // BPS
            widx_l.append(pw.astype(np.uint16))
            widx2_l.append(pw2.astype(np.uint16))
            if has_quads:
                widx3_l.append(_zrows(nsec_p))
                widx4_l.append(_zrows(nsec_p))
            _comp_common(nsec_p, nbp, pkeys, is_quad=False)

    # route all compressed-region sections in one pass, then interleave
    # with the base plan's already-routed rows in stream order
    ck = np.concatenate(comp_keys) if comp_keys else np.zeros(0, np.int32)
    if ck.size:
        routed = build_sections_native(ck.astype(np.int32))
        if routed is not None:
            pr = [a.reshape(-1, 128) for a in routed]
        else:  # no native toolchain for routing: python per-section
            nsp = ck.size // SEC
            pr = [np.zeros((nsp * SEC_R, 128), np.uint16)
                  for _ in range(5)]
            for s in range(nsp):
                rs = _section_python(
                    ck[s * SEC:(s + 1) * SEC].astype(np.int64))
                for a, r in zip(pr, rs):
                    a[s * SEC_R:(s + 1) * SEC_R] = r
    route_l = [[] for _ in range(5)]
    bpos = cpos = 0
    for kind, nsec_c in chunk_kinds:
        if kind == "comp":
            for i in range(5):
                route_l[i].append(pr[i][cpos * ROWS:(cpos + nsec_c) * ROWS])
            cpos += nsec_c
        else:
            src_rows = (base.wa, base.wb, base.sstart, base.wa2, base.wb2)
            for i in range(5):
                route_l[i].append(
                    src_rows[i][bpos * ROWS:(bpos + nsec_c) * ROWS])
            bpos += nsec_c

    sb = np.concatenate(sb_l)
    nblocks = sb.size
    bdt = _block_dtype(nblocks)
    sb = sb.astype(bdt)
    border = np.argsort(sb, kind="stable").astype(bdt)
    lm = np.concatenate(lm_l)
    lm2 = np.concatenate(lm2_l)
    pm = np.concatenate(pm_l)
    qm = np.concatenate(qm_l)
    nslots = nblocks * BLK
    nsec = nslots // SEC
    nx = (max(int(sb.max()) + base.nslices, -(-n // SLICE) + 1)) * SLICE
    plan = EdgePlan(
        n=n, m=m, nslots=nslots, nmid=nmid, nsec=nsec, nx=nx,
        win=base.win, nslices=base.nslices,
        widx=np.concatenate(widx_l), sb=sb,
        ws=np.concatenate(ws_l), border=border,
        weights=None,
        wa=np.concatenate(route_l[0]), wb=np.concatenate(route_l[1]),
        sstart=np.concatenate(route_l[2]), wa2=np.concatenate(route_l[3]),
        wb2=np.concatenate(route_l[4]),
        sec_mid=np.concatenate(secmid_l), perm=perm, n_src=0,
        lm=lm if lm.any() else None,
        lm2=lm2 if lm2.any() else None,
        wt2=np.concatenate(wt2_l) if base.wt2 is not None else None,
        pm=pm if pm.any() else None,
        widx2=np.concatenate(widx2_l),
        qm=qm if qm.any() else None,
        widx3=np.concatenate(widx3_l) if has_quads else None,
        widx4=np.concatenate(widx4_l) if has_quads else None,
    )
    logger.info(
        "EdgePlan (compressed): m=%d quads=%d pairs=%d slots=%d "
        "(%.3f slots/edge) mids=%d sections=%d in %.2fs", m,
        q.shape[1], s1.size, nslots, nslots / max(1, m), nmid, nsec,
        time.perf_counter() - t0)
    return plan


def _section_python(keys, colorer=None):
    """Pure-python routing of one section (fallback / pad sections).

    Returns (wa, wb, sstart, wa2, wb2), shaped for the kernel.
    """
    route_fn = _route.clos_route if colorer is None else colorer
    sort_order = np.argsort(keys, kind="stable")
    target = np.empty(SEC, np.int64)
    target[sort_order] = np.arange(SEC)
    idx = route_fn(target, SEC_R)
    pad = ((keys == -1) | (keys == MID)).reshape(SEC_R, 128)
    wa_s, wb_s = _route.pack_routing(idx, pad)
    s_key = keys[sort_order]
    ss_s = np.searchsorted(s_key, s_key, side="left")
    target2, present = _route.ends_to_dst_perm(s_key, MID)
    idx2 = route_fn(target2, SEC_R)
    wa2_s, wb2_s = _route.pack_routing(
        idx2, out_mask=present.reshape(SEC_R, 128))
    return (wa_s, wb_s.reshape(SEC_R, 128),
            ss_s.astype(np.uint16).reshape(SEC_R, 128),
            wa2_s, wb2_s.reshape(SEC_R, 128))
