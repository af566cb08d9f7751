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


def _k1_classes(plan: EdgePlan):
    """Partition K1 blocks by window rows scanned and gather mode.

    The window-row scan costs 3 VREG ops per row per tile, and most
    blocks need far fewer rows than the graph-wide window (hub tiles
    have tiny src spans).  Each class runs as its own pallas call with
    a statically smaller window, chained via output aliasing — paying
    block-max instead of graph-max rows.  Blocks whose every slot sits
    in the VREG row matching its window row mod 8 (the plan's
    row-matched placement — verified here from widx alone, so old
    packed plans simply class as rowscan) instead run the "rowmatch"
    kernel: one lane taa per 8-row window group (~8x fewer VREG ops;
    kernels._k1_kernel).  Classes covering < 5% of blocks merge upward
    within their mode (dispatch overhead isn't worth it).

    Returns [(win_c, mode_c, border_c)]; border_c keeps the plan's
    slice-major visit order.
    """
    import numpy as np

    from graph_tpu.engine.kernels import BLK, TILE, TPB

    nblocks = plan.sb.shape[0]
    if nblocks == 0:
        return [(plan.win, "rowscan", plan.border)]
    widx = plan.widx.astype(np.int32)
    lm = (plan.lm.astype(bool) if getattr(plan, "lm", None) is not None
          else np.zeros(nblocks, bool))
    lm2 = (plan.lm2.astype(bool) if getattr(plan, "lm2", None) is not None
           else np.zeros(nblocks, bool))
    pm = (plan.pm.astype(bool) if getattr(plan, "pm", None) is not None
          else np.zeros(nblocks, bool))
    qm = (plan.qm.astype(bool) if getattr(plan, "qm", None) is not None
          else np.zeros(nblocks, bool))
    lm &= ~pm & ~qm
    lm2 &= ~pm & ~qm
    tile_max = widx.reshape(-1, TILE).max(axis=1).astype(np.int64)
    blk_rows = tile_max.reshape(-1, TPB).max(axis=1) // 128 + 1
    # lanemap blocks (plan lanemap_pack): widx carries the row TABLE in
    # bits 7..14 (8 bits; 9 bits incl. bit 15 for win-65536 plans), so
    # their window need comes from the largest table entry, not from a
    # (meaningless) position decode
    tmask = 511 if plan.win > 32768 else 255
    amax = ((widx >> 7) & tmask).reshape(-1, TILE).max(axis=1)
    lm_rows = amax.reshape(-1, TPB).max(axis=1).astype(np.int64) + 1
    blk_rows = np.where(lm, lm_rows, blk_rows)
    if lm2.any():
        # two-table blocks: need covers both tables (table 1 is 8-bit
        # here — bit 15 is the slot's table-select)
        a1max = ((widx >> 7) & 255).reshape(-1, TILE).max(axis=1)
        t2max = plan.wt2.astype(np.int64).reshape(-1, TILE).max(axis=1)
        lm2_rows = np.maximum(a1max.reshape(-1, TPB).max(axis=1),
                              t2max.reshape(-1, TPB).max(axis=1)) + 1
        blk_rows = np.where(lm2, lm2_rows, blk_rows)
    if pm.any() or qm.any():
        # pair/quad blocks (plan v10/v11): row tables in widx bits
        # 7..14 (8-bit, HUB <= 32768 — bit 15 reserved zero) or 7..15
        # (9-bit, HUB = 65536); the 9-bit decode is correct for both;
        # window need covers every stream of the block
        streams = [widx, plan.widx2.astype(np.int32)]
        if qm.any():
            streams += [plan.widx3.astype(np.int32),
                        plan.widx4.astype(np.int32)]
        pamax = ((widx >> 7) & 511).reshape(-1, TILE).max(axis=1)
        for s in streams[1:]:
            pamax = np.maximum(pamax, ((s >> 7) & 511)
                               .reshape(-1, TILE).max(axis=1))
        pm_rows = pamax.reshape(-1, TPB).max(axis=1).astype(np.int64) + 1
        blk_rows = np.where(pm | qm, pm_rows, blk_rows)
    # 1024-granularity classes (ws starts are 1024-aligned): power-of-two
    # rounding cost up to 2x scan rows (e.g. 37 actual rows paid 64)
    # (pair/quad blocks cap at their own hub window, not plan.win)
    cap = np.where(pm | qm, 65536, plan.win)
    need = np.maximum(1024, np.minimum(
        cap, ((blk_rows * 128 + 1023) // 1024) * 1024))
    # row-matched blocks: every slot's window row == 8*(widx>>10) + row
    r3 = (widx >> 7) & 7
    rowpat = (np.arange(widx.shape[0], dtype=np.int32) % 8)[:, None]
    conform = ((r3 == rowpat).all(axis=1)
               .reshape(-1, BLK // 128).all(axis=1)) & ~lm & ~lm2 & ~pm & ~qm
    out = []
    for mode, sel in (("rowscan", ~conform & ~lm & ~lm2 & ~pm & ~qm),
                      ("rowmatch", conform),
                      ("lanemap", lm), ("lanemap2", lm2), ("pair", pm),
                      ("quad", qm)):
        if not sel.any():
            continue
        need_m = np.where(sel, need, -1)
        wins = [int(w) for w in np.sort(np.unique(need_m[sel]))]
        for w in wins[:-1]:
            if int((need_m == w).sum()) < nblocks * 0.05:
                bigger = need_m[need_m > w]
                need_m[need_m == w] = (bigger.min() if bigger.size else w)
        for w in (int(v) for v in np.sort(np.unique(need_m[sel]))):
            border_c = plan.border[
                need_m[plan.border.astype(np.int64)] == w]
            out.append((w, mode, border_c))
    return out


#: Candidate (lane_steps, row_steps) scan depths for K2 section classes
#: (ascending cost; every section runs the smallest level covering its
#: longest segment).  On RMAT the typical section's longest run is the
#: biggest hub in its mid divided by the mid's section count — usually
#: a few hundred to a few thousand slots (row span 2-30), far below the
#: worst-case 2**16 the legacy kernel's 9 row steps cover.
K2_LEVELS = ((5, 1), (7, 3), (7, 5), (7, 7), (7, 9))


def _k2_classes(plan):
    """Partition K2 sections by the segmented-scan depth they need.

    Derived from the plan's ``sstart`` alone (no format change): a
    section whose longest segment extends ``d`` lanes within a row and
    spans ``r`` rows only needs ceil(log2) scan steps of each — most
    sections need far fewer than the worst-case 7+9 steps the legacy
    kernel unrolls.  Classes covering < 5% of sections merge upward.

    Returns [(lane_steps, row_steps, section_ids)] ascending, or None
    when a single full-depth class covers everything (legacy path).
    """
    from graph_tpu.engine.kernels import SEC_R

    nsec = plan.nsec
    if nsec == 0:
        return None
    lane_need = np.zeros(nsec, np.int64)
    row_need = np.zeros(nsec, np.int64)
    lane = np.arange(128)[None, None, :]
    rowstart = (np.arange(SEC_R) * 128)[None, :, None]
    pos = (rowstart + lane)  # (1, SEC_R, 128) sorted-layout positions
    for lo in range(0, nsec, 64):  # chunked: the temps are nsec*256KB
        hi = min(lo + 64, nsec)
        ss = plan.sstart[lo * SEC_R:hi * SEC_R].reshape(
            hi - lo, SEC_R, 128).astype(np.int64)
        # tail pads sort last and form one giant segment whose scanned
        # value is never routed out (route 2 masks it) — exclude those
        # positions or every section would class as full-depth
        npad = (plan.wa[lo * SEC_R:hi * SEC_R].reshape(
            hi - lo, SEC_R, 128) >> 15).astype(np.int64).sum(axis=(1, 2))
        real_end = (SEC_R * 128 - (npad - 1))[:, None, None]  # keep lead
        lane_d = lane - np.maximum(ss - rowstart, 0)
        lane_need[lo:hi] = np.where(pos < real_end, lane_d,
                                    0).max(axis=(1, 2))
        # per-position row distance to its segment start: a superset of
        # both the run-scan distance (row ends) and the carry distance
        # for segments crossing into a partially-padded row
        row_d = rowstart // 128 - ss // 128
        row_need[lo:hi] = np.where(pos < real_end, row_d,
                                   0).max(axis=(1, 2))
    lane_steps = np.ceil(np.log2(np.maximum(lane_need, 0) + 1)).astype(int)
    row_steps = np.ceil(np.log2(np.maximum(row_need, 0) + 1)).astype(int)
    level = np.full(nsec, len(K2_LEVELS) - 1, np.int64)
    for i in reversed(range(len(K2_LEVELS) - 1)):
        l_, r_ = K2_LEVELS[i]
        fits = (lane_steps <= l_) & (row_steps <= r_)
        level = np.where(fits, i, level)
    # merge sparse levels upward (dispatch overhead isn't worth it)
    for i in range(len(K2_LEVELS) - 1):
        if 0 < (level == i).sum() < nsec * 0.05:
            level[level == i] = i + 1
    out = []
    for i in range(len(K2_LEVELS)):
        ids = np.nonzero(level == i)[0].astype(np.int32)
        if ids.size:
            out.append((K2_LEVELS[i][0], K2_LEVELS[i][1], ids))
    if len(out) == 1 and out[0][:2] == K2_LEVELS[-1]:
        return None  # everything needs full depth: legacy single call
    return out


def permute(key: jax.Array, v: jax.Array) -> jax.Array:
    """out[key[i]] = v[i] via a device sort (int32 keys, ~300 Melem/s).

    XLA's 1-D gather is scalarized (~15 ns/elem) on TPU; for the static
    node permutations of a degree-relabeled plan a key-value sort is an
    order of magnitude faster.  ``permute(plan.perm, x)`` maps original
    order -> internal, ``permute(iperm, y)`` maps back.
    """
    return jax.lax.sort_key_val(key, v)[1]


class EdgeEngine:
    """Device-resident compiled edge-traversal plan.

    If the plan was built with ``relabel="degree"``, the kernels run in
    an internal node order; the public ops permute in/out per call, and
    iterative drivers pass ``internal=True`` with pre-permuted vectors
    (see :func:`permute`) to pay the two permutes once per run.

    >>> import numpy as np
    >>> from graph_tpu.engine.engine import EdgeEngine
    >>> from graph_tpu.engine.plan import build_plan
    >>> plan = build_plan(np.array([0, 1, 2]), np.array([2, 2, 0]), n=3)
    >>> eng = EdgeEngine(plan, interpret=True)  # interpret: runs anywhere
    >>> x = np.array([0.25, 0.5, 0.125], np.float32)
    >>> np.asarray(eng.spmv(x)).tolist()  # y[d] = sum of x[s] over s->d
    [0.125, 0.0, 0.75]
    """

    def __init__(self, plan: EdgePlan, interpret: bool = False,
                 cache_dir=None, fast_permute: "bool | None" = None):
        self.plan = plan
        self.interpret = interpret
        self.dev = plan.device_arrays()
        self.k1_cls = []
        for win_c, mode_c, border_c in _k1_classes(plan):
            self.k1_cls.append((win_c, mode_c))
            self.dev[f"border{win_c}_{mode_c}"] = jnp.asarray(border_c)
        self.k2_classes = _k2_classes(plan)
        if self.k2_classes is not None:
            cls_arr = np.zeros(plan.nsec, np.int32)
            for i, (_, _, ids) in enumerate(self.k2_classes):
                cls_arr[ids] = i
            self.dev["k2cls"] = jnp.asarray(cls_arr)
            self.k2_levels = tuple(
                (ls, rs) for ls, rs, _ in self.k2_classes)
        self._fp_in = self._fp_out = None
        if plan.perm is not None:
            if fast_permute is None:
                import os

                flag = os.environ.get("GRAPH_TPU_FAST_PERMUTE")
                if flag is not None:
                    fast_permute = flag == "1"
                else:
                    fast_permute = (plan.n >= (1 << 21) and not interpret
                                    and jax.default_backend() == "tpu")
            if fast_permute:
                self._build_fast_permute(cache_dir)

    def _build_fast_permute(self, cache_dir=None):
        """Gather-plan permutes for the degree relabel (round 5).

        ``permute`` costs a full device key-value sort (~14 ms at
        scale 22 — 9% of the 20-iteration PageRank bench for ONE
        output conversion).  A permutation is a gather with exactly
        one in-edge per destination, so a tiny EdgePlan computes it
        through the K1/K2 min path in ~1 ms, bit-exactly: a singleton
        segment's min IS the element (any finite value < 3e38; int32
        exactly).  Two plans: internal -> API order (out) and API ->
        internal (in)."""
        from graph_tpu.engine.plan import load_or_build_plan

        n = self.plan.n
        perm = self.plan.perm.astype(np.int64)
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(n, dtype=perm.dtype)
        ar = np.arange(n, dtype=np.int64)
        out_plan = load_or_build_plan(perm, ar, n, cache_dir=cache_dir,
                                      pair=False)
        in_plan = load_or_build_plan(iperm, ar, n, cache_dir=cache_dir,
                                     pair=False)
        self._fp_out = EdgeEngine(out_plan, interpret=self.interpret)
        self._fp_in = EdgeEngine(in_plan, interpret=self.interpret)
        self.dev["fp_out"] = self._fp_out.dev
        self.dev["fp_in"] = self._fp_in.dev

    def to_internal_dev(self, dev, x):
        """x in API node order -> the plan's internal order.

        Bit-exact for int32 and for f32 values of magnitude < 3e38
        (the gather plan's singleton-min identity); falls back to the
        sort-based :func:`permute` without a fast-permute plan."""
        if self._fp_in is not None and "fp_in" in dev:
            if x.dtype == jnp.int32:
                return self._fp_in.smin_int_dev(dev["fp_in"], x)
            return self._fp_in.smin_dev(dev["fp_in"], x)
        return permute(dev["perm"], x)

    def to_public_dev(self, dev, y):
        """y in the plan's internal order -> API node order."""
        if self._fp_out is not None and "fp_out" in dev:
            if y.dtype == jnp.int32:
                return self._fp_out.smin_int_dev(dev["fp_out"], y)
            return self._fp_out.smin_dev(dev["fp_out"], y)
        return permute(dev["iperm"], y)

    def _k1(self, dev, xp, weights=None, combine="none", pair_op="add"):
        """Chained per-window-class K1 calls (see :func:`_k1_classes`).

        ``pair_op`` is the in-slot combine for hub-pair blocks (plan
        v10): "add" when the gather feeds a sum reduce, "min" for min
        reduces — both associative and commutative in the K2
        accumulator domain, so paired results stay bit-exact."""
        contrib = None
        for win_c, mode_c in self.k1_cls:
            comp = mode_c in ("pair", "quad")
            contrib = k1_gather(
                xp, dev["widx"], dev[f"border{win_c}_{mode_c}"], dev["sb"],
                dev["ws"], win=win_c, nslices=self.plan.nslices,
                weights=weights if not comp else None,
                combine=combine if not comp else "none",
                mode=mode_c,
                out_init=contrib, interpret=self.interpret,
                wt2=dev.get("wt2") if mode_c == "lanemap2" else None,
                widx2=dev.get("widx2") if comp else None,
                widx3=dev.get("widx3") if mode_c == "quad" else None,
                widx4=dev.get("widx4") if mode_c == "quad" else None,
                pair_op=pair_op)
        return contrib

    def _k2(self, dev, contrib, op):
        """K2 reduce; per-section scan-depth classes when classed."""
        p = self.plan
        classes = getattr(self, "k2_classes", None)
        if not classes or "k2cls" not in dev:
            return k2_reduce(contrib, dev["wa"], dev["wb"], dev["sstart"],
                             dev["wa2"], dev["wb2"], dev["sec_mid"], p.nmid,
                             op=op, interpret=self.interpret)
        return k2_reduce(contrib, dev["wa"], dev["wb"], dev["sstart"],
                         dev["wa2"], dev["wb2"], dev["sec_mid"], p.nmid,
                         op=op, interpret=self.interpret,
                         sec_cls=dev["k2cls"], levels=self.k2_levels)

    @classmethod
    def build(cls, src, dst, n, values=None, colorer=None,
              interpret: bool = False, cache_dir=None, relabel=None):
        """Build (or load from the plan cache — ``cache_dir`` or
        $GRAPH_TPU_PLAN_CACHE) the engine for an edge list."""
        from graph_tpu.engine.plan import load_or_build_plan

        return cls(load_or_build_plan(np.asarray(src), np.asarray(dst), n,
                                      values=values, colorer=colorer,
                                      cache_dir=cache_dir, relabel=relabel),
                   interpret=interpret, cache_dir=cache_dir)

    def spmv(self, x: jax.Array, bound: float = 1.0) -> jax.Array:
        """y[d] = sum_{(s,d) in E} x[s]; x: (n,) f32 -> y: (n,) f32.

        Contributions are accumulated in int32 fixed point, so each
        per-destination sum must stay below 2**(31-FIXED_BITS) = 2 in
        magnitude or it silently wraps mod 2**32.  ``bound`` is the
        caller's promise of the largest per-destination |sum|: inputs
        are pre-scaled by 1/bound and the result rescaled, trading one
        bit of fixed-point precision per doubling.  PageRank sums are
        <= 1 (the default); pass a larger bound for general SpMV use.

        NOTE: closes over the plan's device arrays — fine for eager use
        or small graphs, but inside a jit the arrays become embedded
        constants.  For large graphs use :meth:`spmv_dev` and pass
        ``self.dev`` through the jit arguments.
        """
        return self.spmv_dev(self.dev, x, bound=bound)

    def spmv_dev(self, dev, x: jax.Array, bound: float = 1.0,
                 internal: bool = False) -> jax.Array:
        """Functional spmv: plan arrays passed explicitly (jit-arg safe).

        See :meth:`spmv` for the ``bound`` fixed-point range contract.
        """
        return self.apply_dev(dev, x, bound=bound, internal=internal)

    def apply(self, x: jax.Array, *, combine: str = "none",
              reduce: str = "sum", bound: float = 1.0) -> jax.Array:
        """Generic semiring edge-map-reduce: the public engine surface.

        ``y[d] = reduce over edges (s -> d) of combine(x[s], w(s,d))``

        combine: "none" (x[s]), "mul" (x[s] * w), "add" (x[s] + w —
        the tropical combine); reduce: "sum" or "min".  Named
        instances: (none, sum) = :meth:`spmv`, (add, min) =
        :meth:`relax` (Bellman-Ford), (none, min) = :meth:`smin` (WCC
        hooks), (mul, sum) = weighted SpMV.  Replaces the reference's
        per-algorithm pull loops (page_rank.rs:143-146, sssp.rs:184-202)
        with one compiled plan.

        reduce="sum" accumulates in int32 fixed point; see :meth:`spmv`
        for the ``bound`` contract.  reduce="min" requires values exact
        in f32 and nonnegative (IEEE order == integer order).
        """
        return self.apply_dev(self.dev, x, combine=combine, reduce=reduce,
                              bound=bound)

    def apply_dev(self, dev, x: jax.Array, *, combine: str = "none",
                  reduce: str = "sum", bound: float = 1.0,
                  internal: bool = False) -> jax.Array:
        """Functional :meth:`apply`: plan arrays passed explicitly.

        ``internal=True`` skips the degree-relabel permutes (x is
        already in the plan's internal order and y is returned in it).
        """
        from graph_tpu.engine.kernels import FIXED_BITS, INF

        if combine not in ("none", "add", "mul"):
            raise ValueError(f"combine must be none|add|mul, got {combine!r}")
        if reduce not in ("sum", "min"):
            raise ValueError(f"reduce must be sum|min, got {reduce!r}")
        if combine != "none" and "weights" not in dev:
            raise ValueError(
                f"combine={combine!r} needs a plan built with edge values")
        if bound != 1.0:
            if reduce != "sum" or combine == "add":
                raise ValueError(
                    "bound rescaling is only valid for linear reductions "
                    "(reduce='sum' with combine 'none'/'mul')")
            return self.apply_dev(dev, x * jnp.float32(1.0 / bound),
                                  combine=combine, reduce=reduce,
                                  internal=internal) * bound
        p = self.plan
        if not internal and "perm" in dev:
            x = self.to_internal_dev(dev, x)
        if reduce == "sum" and combine == "none":
            # Pre-quantize to fixed point at n granularity: K1 gathers
            # int32 quanta and K2 skips the per-slot round/mul/astype
            # (~4 VREG ops per slot for a pass that is 1/edge_factor
            # the size).  round(x[s] * 2**30) commutes with the gather,
            # so results are bit-identical to the in-kernel quantize.
            xq = jnp.round(x * jnp.float32(1 << FIXED_BITS)).astype(
                jnp.int32)
            xp = jnp.zeros(p.nx, jnp.int32).at[: p.nsrc].set(xq)
            contrib = self._k1(dev, xp)
            y_mids = self._k2(dev, contrib, "sum")
            y = (y_mids.reshape(-1)[: p.n].astype(jnp.float32)
                 / jnp.float32(1 << FIXED_BITS))
            if not internal and "perm" in dev:
                y = self.to_public_dev(dev, y)
            return y
        fill = 0.0 if reduce == "sum" else INF
        xp = jnp.full(p.nx, fill, jnp.float32).at[: p.nsrc].set(x)
        weights = dev.get("weights") if combine != "none" else None
        contrib = self._k1(dev, xp, weights=weights, combine=combine,
                           pair_op="min" if reduce == "min" else "add")
        y_mids = self._k2(dev, contrib, reduce)
        y = y_mids.reshape(-1)[: p.n]
        if reduce == "sum":
            y = y.astype(jnp.float32) / jnp.float32(1 << FIXED_BITS)
        else:
            y = jax.lax.bitcast_convert_type(y, jnp.float32)
        if not internal and "perm" in dev:
            y = self.to_public_dev(dev, y)
        return y

    def relax(self, dist: jax.Array) -> jax.Array:
        """y[d] = min over weighted edges (s -> d) of dist[s] + w.

        The tropical-semiring SpMV: one Bellman-Ford relaxation round,
        replacing the reference's CAS-min loop (sssp.rs:184-202).
        Requires the plan to have been built with edge values.
        """
        return self.relax_dev(self.dev, dist)

    def relax_dev(self, dev, dist: jax.Array,
                  internal: bool = False) -> jax.Array:
        return self.apply_dev(dev, dist, combine="add", reduce="min",
                              internal=internal)

    def smin(self, x: jax.Array) -> jax.Array:
        """y[d] = min over edges (s -> d) of x[s]; empty rows get +3e38.

        Values must be exact in f32 (component labels up to 2**24 are).
        """
        return self.smin_dev(self.dev, x)

    def smin_dev(self, dev, x: jax.Array,
                 internal: bool = False) -> jax.Array:
        return self.apply_dev(dev, x, reduce="min", internal=internal)

    def smin_int(self, x: jax.Array) -> jax.Array:
        """y[d] = min over edges (s -> d) of int32 x[s]; empty rows get
        2**31-1.  Exact for any nonnegative int32 values — the WCC label
        path beyond f32's 2**24 (one int32 pipeline end to end)."""
        return self.smin_int_dev(self.dev, x)

    def smin_int_dev(self, dev, x: jax.Array,
                     internal: bool = False) -> jax.Array:
        from graph_tpu.engine.kernels import IMAX

        p = self.plan
        if not internal and "perm" in dev:
            x = self.to_internal_dev(dev, x)
        xp = jnp.full(p.nx, IMAX, jnp.int32).at[: p.nsrc].set(x)
        contrib = self._k1(dev, xp, pair_op="min")
        y_mids = self._k2(dev, contrib, "imin")
        y = y_mids.reshape(-1)[: p.n]
        if not internal and "perm" in dev:
            y = self.to_public_dev(dev, y)
        return y




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
        try:
            weakref.finalize(graph, _GRAPH_ENGINES.pop, key, None)
        except TypeError:
            # Not weakref-able: don't cache — an id-keyed entry with no
            # eviction could later serve a different graph reusing the id.
            return eng
        _GRAPH_ENGINES[key] = eng
    return eng
