"""Pallas TPU kernels for the EdgeEngine.

K1 (gather): streams the plan's edge slots in (mid, src)-sorted order
and produces per-edge contributions ``x[src]`` via a windowed 8-way
select gather — the vectorized replacement for the reference's per-edge
pull loop (crates/algos/src/page_rank.rs:143-146).  Measured 0.055
ns/edge on v5e (vs 15 ns/edge for XLA's scalarized 1-D gather).

K2 (reduce): per 64K-edge section of one mid (64K destinations), routes
contributions through a build-time-computed Clos/Benes permutation
network into destination-sorted order inside VMEM, segment-reduces them
with a masked log-shift scan (int32 fixed point for sums — wraparound-
exact, same trick as graph_tpu.ops.segment.segment_sum_fixedpoint; f32
for mins), then routes each destination's segment-end value to output
position d through a SECOND build-time Benes network (round 2: replaces
the serialized dynamic-window compaction loop, which was 77% of K2 time
— the map end-position -> d is injective so it is a permutation; absent
destinations receive completion-fill garbage and are masked by a
per-output "present" bit).  This replaces the reference's atomic
scatter (crates/builder/src/graph/csr.rs:154-172) and CAS loops — all
conflicts were resolved on the host at plan-build time.

Layout constants here must match graph_tpu.engine.plan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- K1 layout constants
TILE = 1024            # edge slots per tile (one (8,128) VREG tile)
TPB = 16               # tiles per K1 block
BLK = TILE * TPB       # 16384 edge slots per K1 block
WIN = 8192             # gather window per tile (multiple of 1024)
SLICE = 32768          # x slice granularity; a block sees NSLICES slices
NSLICES = 3            # consecutive x slices staged per block
SPAN_BUDGET = WIN - 1024           # max (src - tile_first_src) within a tile
BLOCK_SPAN = NSLICES * SLICE - 1   # max (src - block_slice_base)

# ---- K2 layout constants
SEC_R = 512            # rows per section
SEC = SEC_R * 128      # 65536 edge slots per section
MID = 65536            # destinations per mid
FIXED_BITS = 30        # fixed-point fraction bits


def _pmod(a, n):
    """Python-semantics a mod n (n a positive python int) on traced
    int32 scalars; lax.rem keeps the dividend's sign, so fix up."""
    if n & (n - 1) == 0:
        return a & (n - 1)
    r = jax.lax.rem(a, jnp.int32(n))
    return jnp.where(r < 0, r + n, r)


def _k1_kernel(border_ref, sb_ref, ws_ref, x_refs, widx_ref, out_ref,
               xs_ref, *, win=WIN, ew_ref=None, combine="none",
               mode="rowscan", modular=False, wt2_ref=None,
               widx2_ref=None, widx3_ref=None, widx4_ref=None,
               pair_op="add"):
    """Windowed gather; optionally combines a per-edge weight stream:
    combine="add" -> x[src] + w (tropical, SSSP relaxation),
    combine="mul" -> x[src] * w (weighted SpMV).

    ``win`` is the per-graph gather window (round 2): the unrolled
    window-row scan costs 3 VREG ops per row per tile, so the plan
    picks the smallest power-of-two window whose extra tile splits
    (padding) don't outweigh the saved rows.  Scalar-predicated
    per-tile row counts were measured 3.7x SLOWER than this static
    unroll (branch+VMEM-roundtrip per row, see PERF_NOTES.md).

    ``mode="rowmatch"`` (round 3): the plan places every slot of these
    blocks in the VREG row matching its window row mod 8 (row-matched
    layout, verified from widx by engine._k1_classes), so the gather
    collapses to ONE lane take_along_axis per 8-row window group plus
    a group select — 3 VREG ops per 1024-window-element group instead
    of 24 (measured ~5x on the big-window tail classes)."""
    k = pl.program_id(0)
    blk = border_ref[k].astype(jnp.int32)
    # restage the x slices only when the slice base changes: blocks
    # visit in slice-major order, so most steps reuse the scratch
    # (saves ~256 VREG copies per slice per 16K-slot block)
    prev_blk = border_ref[jnp.maximum(k - 1, 0)].astype(jnp.int32)
    # compare via int32 subtraction: a direct != on (u)int16 scalars
    # emits an i16 cmpi Mosaic cannot legalize
    cb = sb_ref[blk].astype(jnp.int32) * 2 // 2
    pb = sb_ref[prev_blk].astype(jnp.int32) * 2 // 2
    nsl = len(x_refs)

    if modular and nsl > 1:
        # Modular stream assignment (round 3): stream i always carries
        # the slice s with s mod nslices == i (s = sb + ((i - sb) mod
        # n)), so a +1 slice-base step changes ONE stream's block index
        # — the pallas pipeline re-fetches one slice from HBM instead
        # of all nslices (~n x less x traffic; ~24% of K1 bytes at the
        # scale-22 win-16384/8-slice config).  Scratch keeps slice s at
        # modular position (s mod n); position n mirrors position 0 so
        # windows that straddle modular n-1 -> 0 read contiguously.
        for i, xr in enumerate(x_refs):
            si_c = cb + _pmod(i - cb, nsl)
            si_p = pb + _pmod(i - pb, nsl)

            @pl.when((k == 0) | (si_c != si_p))
            def _(xr=xr, i=i):
                xs_ref[i * SLICE:(i + 1) * SLICE] = xr[:]
                if i == 0:
                    xs_ref[nsl * SLICE:(nsl + 1) * SLICE] = xr[:]
    else:
        @pl.when((k == 0) | (cb != pb))
        def _():
            for i, xr in enumerate(x_refs):
                xs_ref[i * SLICE:(i + 1) * SLICE] = xr[:]

    def tile_body(t, _):
        span_start = ws_ref[blk * TPB + t].astype(jnp.int32) * 1024
        if modular and nsl > 1:
            # span coords -> modular scratch coords (window fits within
            # two consecutive slices: win <= SLICE; the straddle past
            # modular n-1 lands in the mirror slot)
            j = span_start >> 15            # // SLICE (32768)
            off = span_start & (SLICE - 1)
            start = pl.multiple_of(_pmod(cb + j, nsl) * SLICE + off, 1024)
        else:
            start = pl.multiple_of(span_start, 1024)
        w = xs_ref[pl.ds(start, win)].reshape(win // 128, 128)
        idx = widx_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)  # window-local
        lo = idx & 127
        if mode == "rowmatch":
            # row-matched layout: slot's window row == 8*(idx>>10) + VREG
            # row, so each 8-row group needs one lane taa + group select
            grp = idx >> 10
            acc = jnp.zeros((8, 128), xs_ref.dtype)
            for g in range(win // 1024):
                u = jnp.take_along_axis(w[g * 8:(g + 1) * 8, :], lo, axis=1)
                acc = u if win == 1024 else jnp.where(grp == g, u, acc)
        elif mode == "lanemap":
            # Lane-mapped layout (plan lanemap_pack): chaining a sublane
            # gather then a lane gather yields u2[i,j] =
            # w[A[i, lo[i,j]], lo[i,j]] — the row index is evaluated at
            # the FINAL lane, so A must be a per-(VREG row, window lane)
            # TABLE, not a per-slot index.  The plan places slots so
            # each (row, window-lane) pair maps to one window row and
            # packs the stream as  table row (bits 7..14, at the slot's
            # PHYSICAL lane)  |  slot window lane (bits 0..6); 8 table
            # bits cover windows up to 32768, and win-65536 plans use a
            # 9-bit table (bits 7..15 — bit 15 is otherwise unused in
            # the lanemap encoding).  Mosaic lowers the 8-deep sublane
            # gather natively, so each 8-row window group costs
            # 2 VREG ops + one final lane taa — measured
            # window-size-independent ~0.148 ns/slot vs 0.38 for the
            # win-16384 rowscan (scripts/perf_k1_lanemap.py);
            # duplicates of one src are free (unlike "rowmatch").
            A = (idx >> 7) & (511 if win > 32768 else 255)
            if win == 1024:
                u = jnp.take_along_axis(w[0:8, :], A, axis=0)
            else:
                g_of = A >> 3
                u = jnp.zeros((8, 128), xs_ref.dtype)
                for g in range(win // 1024):
                    sub = jnp.take_along_axis(w[g * 8:(g + 1) * 8, :],
                                              A & 7, axis=0)
                    u = jnp.where(g_of == g, sub, u)
            acc = jnp.take_along_axis(u, lo, axis=1)
        elif mode == "lanemap2":
            # Two-table lanemap (round 4): per (VREG row, window lane)
            # TWO candidate window rows — table 1 in widx bits 7..14,
            # table 2 in a second uint8 stream (wt2), the slot's choice
            # in widx bit 15 (evaluated at the slot's own position,
            # after both gathers).  Doubles the per-(row,lane) capacity:
            # measured on the scale-22 plan, 2 tables rescue ~76% of
            # the blocks the 1-table pass rejects (~96% total lanemap
            # coverage; scripts/lanemap2_stats.py).
            A1 = (idx >> 7) & 255
            sel = idx >> 15
            A2 = wt2_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)
            if win == 1024:
                u1 = jnp.take_along_axis(w[0:8, :], A1, axis=0)
                u2 = jnp.take_along_axis(w[0:8, :], A2, axis=0)
            else:
                g1 = A1 >> 3
                g2 = A2 >> 3
                u1 = jnp.zeros((8, 128), xs_ref.dtype)
                u2 = jnp.zeros((8, 128), xs_ref.dtype)
                for g in range(win // 1024):
                    wg = w[g * 8:(g + 1) * 8, :]
                    u1 = jnp.where(g1 == g,
                                   jnp.take_along_axis(wg, A1 & 7, axis=0),
                                   u1)
                    u2 = jnp.where(g2 == g,
                                   jnp.take_along_axis(wg, A2 & 7, axis=0),
                                   u2)
            acc = jnp.where(
                sel == 1,
                jnp.take_along_axis(u2, lo, axis=1),
                jnp.take_along_axis(u1, lo, axis=1))
        elif mode in ("pair", "quad"):
            # Hub-pair/quad slots (rounds 4-5): one slot carries TWO
            # (mode="pair") or FOUR (mode="quad") same-destination hub
            # edges; K1 gathers each source through an independent
            # lanemap stream (widx, widx2[, widx3, widx4] — each: slot
            # window lane in bits 0..6, per-lane row table in bits
            # 7..14 (HUB <= 32768: entries <= 255, bit 15 reserved
            # zero) or 7..15 (HUB = 65536 plans: 9-bit entries, win
            # > 32768)) and emits their combine
            # (+ for sum plans, min for min plans — both associative
            # and commutative in the K2 accumulator domain, so results
            # stay bit-exact).  Halves the slot count K2 routes/scans
            # for the ~2/3 of power-law edges that originate at hub
            # sources (PERF_NOTES round-4: 97.4% of scale-22 hub edges
            # pair up; slot ratio 0.689).
            streams = [idx]
            for sref in (widx2_ref, widx3_ref, widx4_ref):
                if sref is not None:
                    streams.append(sref[pl.ds(t * 8, 8), :]
                                   .astype(jnp.int32))
            tmask = 511 if win > 32768 else 255
            vals = []
            for sidx in streams:
                slo = sidx & 127
                A = (sidx >> 7) & tmask
                gA = A >> 3
                u = jnp.zeros((8, 128), xs_ref.dtype)
                for g in range(win // 1024):
                    wg = w[g * 8:(g + 1) * 8, :]
                    u = jnp.where(gA == g,
                                  jnp.take_along_axis(wg, A & 7, axis=0),
                                  u)
                vals.append(jnp.take_along_axis(u, slo, axis=1))
            acc = vals[0]
            for v_k in vals[1:]:
                acc = (acc + v_k) if pair_op == "add" else jnp.minimum(
                    acc, v_k)
        else:
            hi = idx >> 7
            acc = jnp.zeros((8, 128), xs_ref.dtype)
            for h in range(win // 128):
                row = jax.lax.broadcast_in_dim(w[h], (8, 128), (1,))
                g = jnp.take_along_axis(row, lo, axis=1)
                acc = jnp.where(hi == h, g, acc)
        if combine == "add":
            acc = acc + ew_ref[pl.ds(t * 8, 8), :]
        elif combine == "mul":
            acc = acc * ew_ref[pl.ds(t * 8, 8), :]
        out_ref[pl.ds(t * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, TPB, tile_body, 0, unroll=True)


def k1_gather(x_padded, widx, border, sb, ws, *, win=WIN, nslices=NSLICES,
              weights=None, combine="add", out_init=None, interpret=False,
              mode="rowscan", modular=None, wt2=None, widx2=None,
              widx3=None, widx4=None, pair_op="add"):
    """Per-edge gather: out[i] = x_padded[plan position of slot i].

    x_padded: (nx,) f32, nx a multiple of SLICE (>= (max(sb)+NSLICES)*SLICE).
    widx: (nslots//128, 128) uint16 tile-window-local positions (< win).
    border: (k1 grid,) int32 slice-major block visit order (prefetched);
        grid step k processes block border[k], so each x slice streams
        through VMEM exactly once even though blocks of different mids
        revisit the same slices.  May cover a SUBSET of blocks (window
        classes): pass the previous class's result as ``out_init`` —
        it is buffer-aliased to the output so unvisited blocks pass
        through untouched.
    sb: (nblocks,) int32 slice index of each block (prefetched).
    ws: (ntiles,) uint8 window starts / 1024 (slice-local; uint8 keeps
        the SMEM prefetch under the 1 MB scoped limit at scale 24).
    win: static gather window for THESE blocks (power of two <= WIN).
    nslices: x slices staged per block (plan.nslices; the block span
        budget nslices*SLICE binds pad growth at large src gaps —
        scale-24 graphs pair win=16384 with nslices=8).
    Returns (nslots//128, 128) contributions (x_padded's dtype).
    """
    nrows = widx.shape[0]
    nblk = border.shape[0]
    if (wt2 is not None) != (mode == "lanemap2"):
        raise ValueError("wt2 is required iff mode='lanemap2'")
    if (widx2 is not None) != (mode in ("pair", "quad")):
        raise ValueError("widx2 is required iff mode='pair'/'quad'")
    if (widx3 is not None) != (mode == "quad") or (
            widx4 is not None) != (mode == "quad"):
        raise ValueError("widx3/widx4 are required iff mode='quad'")
    if mode in ("pair", "quad") and weights is not None:
        raise ValueError("pair/quad blocks carry no per-edge weights")
    n_in = ((1 + nslices) if weights is None else (2 + nslices)) + (
        0 if out_init is None else 1) + (0 if wt2 is None else 1) + (
        0 if widx2 is None else 1) + (0 if widx3 is None else 2)
    if modular is None:
        # Default OFF (measured): the block visit order is slice-major
        # (border sorted by sb), so slice-base changes are rare (~one
        # per x slice) and the legacy all-restage staging costs almost
        # nothing — while the modular per-tile address arithmetic adds
        # ~14% to K1 at scale 22 (perf_attr 2026-08-18: 0.1013 legacy
        # vs 0.1158 modular ns/edge).  Opt in via GRAPH_TPU_K1_MODXS=1.
        import os
        modular = os.environ.get("GRAPH_TPU_K1_MODXS", "0") == "1"
    modular = modular and nslices > 1 and win <= SLICE

    def _i(v):  # index maps must return signed integer scalars
        return v.astype(jnp.int32)

    def _xspec(i):
        if modular:
            # stream i carries slice sb + ((i - sb) mod nslices): a +1
            # slice-base step leaves all but one stream's index alone,
            # so the pipeline skips their HBM fetches
            def imap(k, bo, sb, ws, i=i):
                base = _i(sb[bo[k]])
                return (base + (i - base) % nslices,)
        else:
            def imap(k, bo, sb, ws, i=i):
                return (_i(sb[bo[k]]) + i,)
        return pl.BlockSpec((SLICE,), imap)

    blockspec = pl.BlockSpec((BLK // 128, 128),
                             lambda k, bo, sb, ws: (_i(bo[k]), 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[_xspec(i) for i in range(nslices)]
        + [blockspec] * (n_in - nslices),
        out_specs=blockspec,
        scratch_shapes=[pltpu.VMEM(
            ((nslices + (1 if modular else 0)) * SLICE,), x_padded.dtype)],
    )
    extra = [] if wt2 is None else [wt2]
    if widx2 is not None:
        # mutually exclusive with wt2 (mode check above)
        extra = [widx2] if widx3 is None else [widx2, widx3, widx4]
    nw = len(extra)

    def _stream_kwargs(e_refs):
        if mode == "lanemap2":
            return {"wt2_ref": e_refs[0]}
        if mode == "pair":
            return {"widx2_ref": e_refs[0]}
        if mode == "quad":
            return {"widx2_ref": e_refs[0], "widx3_ref": e_refs[1],
                    "widx4_ref": e_refs[2]}
        return {}

    if weights is None:
        def kernel(border_ref, sb_ref, ws_ref, *rest):
            x_refs = rest[:nslices]
            widx_ref, out_ref, xs_ref = rest[nslices], rest[-2], rest[-1]
            e_refs = rest[nslices + 1: nslices + 1 + nw]
            _k1_kernel(border_ref, sb_ref, ws_ref, x_refs, widx_ref,
                       out_ref, xs_ref, win=win, mode=mode, modular=modular,
                       pair_op=pair_op, **_stream_kwargs(e_refs))
        args = ([border, sb, ws] + [x_padded] * nslices + [widx] + extra)
    else:
        def kernel(border_ref, sb_ref, ws_ref, *rest):
            x_refs = rest[:nslices]
            widx_ref = rest[nslices]
            e_refs = rest[nslices + 1: nslices + 1 + nw]
            ew_ref = rest[nslices + 1 + nw]
            out_ref, xs_ref = rest[-2], rest[-1]
            _k1_kernel(border_ref, sb_ref, ws_ref, x_refs, widx_ref,
                       out_ref, xs_ref, win=win, ew_ref=ew_ref,
                       combine=combine, mode=mode, modular=modular,
                       **_stream_kwargs(e_refs))
        args = ([border, sb, ws] + [x_padded] * nslices + [widx]
                + extra + [weights])
    aliases = {}
    if out_init is not None:
        aliases = {len(args): 0}  # operand index -> output 0
        args.append(out_init)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, 128), x_padded.dtype),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*args)


INF = 3.0e38  # +inf stand-in (python literal; kernels cannot capture traced consts)
INF_BITS = 2137108966  # np.float32(INF).view(int32); IEEE order == int order for x >= 0
IMAX = 2147483647  # int32 max: the "+inf" of the integer-min path


def _benes(v, wa, wb):
    """Apply the packed Benes stages (A, T, B, C, D, T', E) to v.

    v: (SEC_R, 128) f32 or int32; wa, wb: int32 (already widened).
    Every op is a full-(512,128) lane gather / static roll — the only
    permutation primitives Mosaic executes at bandwidth.
    """
    v = jnp.take_along_axis(v, wa & 127, axis=1)
    y = jnp.swapaxes(v, 0, 1).reshape(SEC_R, 128)
    y = jnp.take_along_axis(y, wb & 127, axis=1)
    # C stage: out[r] = in[(r & ~3) | g]; shift delta in [-3, 3] via rolls
    row_mod4 = jnp.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0), 3)
    delta = ((wb >> 7) & 3) - row_mod4
    zero = jnp.zeros((), v.dtype)
    yc = jnp.where(delta == 0, y, zero)
    for s in (1, 2, 3):
        yc = yc + jnp.where(delta == -s, pltpu.roll(y, s, 0), zero)
        yc = yc + jnp.where(delta == s, pltpu.roll(y, SEC_R - s, 0), zero)
    y = jnp.take_along_axis(yc, (wb >> 9) & 127, axis=1)
    v = jnp.swapaxes(y.reshape(128, SEC_R), 0, 1)
    return jnp.take_along_axis(v, (wa >> 7) & 127, axis=1)


LANE_SHIFTS = (1, 2, 4, 8, 16, 32, 64)
ROW_SHIFTS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def _segmented_scan(q, ss, op, lane_steps=7, row_steps=9):
    """Segmented inclusive scan S[i] = reduce over [sstart[i], i].

    q: (SEC_R, 128) int32 (sum, wraparound-exact; or integer min) or
    f32 (min); ss: (SEC_R, 128) int32 absolute segment-start positions.
    Masked log-shift scans on full shapes: combining at distance sh is
    valid iff i - sh >= sstart[i] (positions of one segment share
    sstart) — fuzz-tested in tests/test_engine.py.

    Each step's two mask compares fold into one against a precomputed
    distance: (lane >= sh) & (lane - sh >= ls)  <=>  lane - max(ls,0)
    >= sh, and for rows (rs_row >= 0 always) rowid - rs_row >= sh —
    one cmp per step instead of three ops (~25% of K2's VREG work).
    Column-127 values are fetched with a lane taa (native) instead of
    a (512,1) slice + per-row broadcast (relayout storms, ~250ns each).

    ``lane_steps``/``row_steps`` truncate the scan to the depth this
    SECTION actually needs (per-section classes, derived at engine
    init from the plan's sstart): a section whose longest segment fits
    k lanes / spans r rows only pays ceil(log2) steps of each —
    row_steps=0 skips the whole row phase including the carry.
    """
    if op == "sum":
        neutral = 0
    elif q.dtype == jnp.int32:
        neutral = IMAX
    else:
        neutral = INF
    comb = (lambda a, b: a + b) if op == "sum" else jnp.minimum
    lane = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
    local_start = ss - rowid * 128               # may be negative
    lane_d = lane - jnp.maximum(local_start, 0)  # ok(sh) <=> lane_d >= sh
    for sh in LANE_SHIFTS[:lane_steps]:
        cand = pltpu.roll(q, sh, 1)
        q = comb(q, jnp.where(lane_d >= sh, cand, neutral))
    if row_steps == 0:
        return q
    # q[r, l] = reduce over [max(sstart, r*128), r*128+l].  Row carries:
    # one masked log-shift scan over the 512 row-end values; row-level
    # segment key = the row where the segment covering THIS row's END
    # starts (same purity argument as the lane scan).
    idx127 = jnp.full((SEC_R, 128), 127, jnp.int32)
    run = jnp.take_along_axis(q, idx127, axis=1)
    rs_row = jnp.take_along_axis(ss, idx127, axis=1) // 128
    row_d = rowid - rs_row                       # ok(sh) <=> row_d >= sh
    for sh in ROW_SHIFTS[:row_steps]:
        cand = pltpu.roll(run, sh, 0)
        run = comb(run, jnp.where(row_d >= sh, cand, neutral))
    # carry into each row = previous row's inclusive scan value
    carry = pltpu.roll(run, 1, 0)
    return comb(q, jnp.where(local_start < 0, carry, neutral))


def _segmented_scan_classed(q, ss, op, cls, levels, qs_ref, rn_ref):
    """Segmented scan with per-SECTION depth, single kernel.

    ``cls`` is this section's class index (traced scalar, prefetched);
    ``levels`` the static ascending (lane_steps, row_steps) ladder.
    The base level runs unconditionally; each deeper level's extra
    steps run under ``@pl.when(cls >= i)`` with the intermediate value
    parked in a VMEM scratch (4 extra (SEC_R,128) VMEM passes) — far
    cheaper than the former one-pallas-call-per-class chaining, which
    paid a fixed dispatch cost AND re-streamed the running output block
    as an extra 4 B/slot input per section.  Lane regions all precede
    row regions, so every level's step sequence is a valid truncation.
    """
    if op == "sum":
        neutral = 0
    elif q.dtype == jnp.int32:
        neutral = IMAX
    else:
        neutral = INF
    comb = (lambda a, b: a + b) if op == "sum" else jnp.minimum
    lane = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
    local_start = ss - rowid * 128
    lane_d = lane - jnp.maximum(local_start, 0)
    for sh in LANE_SHIFTS[: levels[0][0]]:
        q = comb(q, jnp.where(lane_d >= sh, pltpu.roll(q, sh, 1), neutral))
    qs_ref[:] = q
    for i in range(1, len(levels)):
        lo_, hi_ = levels[i - 1][0], levels[i][0]
        if hi_ > lo_:
            @pl.when(cls >= i)
            def _(lo_=lo_, hi_=hi_):
                qq = qs_ref[:]
                for sh in LANE_SHIFTS[lo_:hi_]:
                    qq = comb(qq, jnp.where(lane_d >= sh,
                                            pltpu.roll(qq, sh, 1), neutral))
                qs_ref[:] = qq
    q = qs_ref[:]
    idx127 = jnp.full((SEC_R, 128), 127, jnp.int32)
    run = jnp.take_along_axis(q, idx127, axis=1)
    rs_row = jnp.take_along_axis(ss, idx127, axis=1) // 128
    row_d = rowid - rs_row
    for sh in ROW_SHIFTS[: levels[0][1]]:
        run = comb(run, jnp.where(row_d >= sh, pltpu.roll(run, sh, 0),
                                  neutral))
    rn_ref[:] = run
    for i in range(1, len(levels)):
        lo_, hi_ = levels[i - 1][1], levels[i][1]
        if hi_ > lo_:
            @pl.when(cls >= i)
            def _(lo_=lo_, hi_=hi_):
                rr = rn_ref[:]
                for sh in ROW_SHIFTS[lo_:hi_]:
                    rr = comb(rr, jnp.where(row_d >= sh,
                                            pltpu.roll(rr, sh, 0), neutral))
                rn_ref[:] = rr
    run = rn_ref[:]
    carry = pltpu.roll(run, 1, 0)
    return comb(q, jnp.where(local_start < 0, carry, neutral))


def _k2_kernel(sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref, wb2_ref,
               out_ref, *, op="sum", lane_steps=7, row_steps=9,
               cls=None, levels=None, qs_ref=None, rn_ref=None):
    """Per-section: route -> segmented scan -> route ends to dsts.

    op="sum": int32 fixed-point segment sums (wraparound-exact).
    op="min": f32 segmented min (bit-exact for nonnegative values).
    op="imin": int32 segmented min (exact node-id labels beyond the
    f32 2**24 limit — scale-24 WCC, VERDICT round-1 weak #5).
    The mid accumulator is int32 so cross-section accumulation stays
    exact: sum accumulates fixed-point quanta mod 2**32; min compares
    f32 bit patterns (IEEE order == integer order for nonnegative
    values, which labels/distances/contributions are); imin is plain
    integer min.
    """
    k = pl.program_id(0)
    wa = wa_ref[:].astype(jnp.int32)
    v = v_ref[:]
    # Pad slots (bit 15 of wa) are NOT value-masked here: the sorted
    # layout confines them to their own segments (sort keys -1 / MID),
    # the segmented scan never combines across segment starts, and
    # route 2's present bit masks their outputs — so whatever K1's
    # default pad gather produced stays inert (3 VREG ops saved/slot).
    v = _benes(v, wa, wb_ref[:].astype(jnp.int32))
    # v is destination-sorted (lead pad first, tail pads last)

    ss = ss_ref[:].astype(jnp.int32)
    if op == "sum" and v.dtype == jnp.int32:
        q = v  # pre-quantized fixed-point contributions (engine sum path)
    elif op == "sum":
        q = jnp.round(v * jnp.float32(1 << FIXED_BITS)).astype(jnp.int32)
    if cls is not None:
        if op == "sum":
            S = _segmented_scan_classed(q, ss, "sum", cls, levels,
                                        qs_ref, rn_ref)
        elif op == "imin":
            S = _segmented_scan_classed(v, ss, "min", cls, levels,
                                        qs_ref, rn_ref)
        else:
            S = pltpu.bitcast(
                _segmented_scan_classed(v, ss, "min", cls, levels,
                                        qs_ref, rn_ref), jnp.int32)
    elif op == "sum":
        S = _segmented_scan(q, ss, "sum", lane_steps, row_steps)
    elif op == "imin":
        S = _segmented_scan(v, ss, "min", lane_steps, row_steps)
    else:
        S = pltpu.bitcast(
            _segmented_scan(v, ss, "min", lane_steps, row_steps), jnp.int32)

    # Route each destination's segment-end value to output position d;
    # bit 15 of wa2 (at OUTPUT layout) marks destinations present in
    # this section — everything else is completion-fill garbage.
    wa2 = wa2_ref[:].astype(jnp.int32)
    y = _benes(S, wa2, wb2_ref[:].astype(jnp.int32))
    ok = (wa2 >> 15) == 1

    first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])
    if op == "sum":
        y = jnp.where(ok, y, 0)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += y
    else:
        absent = IMAX if op == "imin" else INF_BITS
        y = jnp.where(ok, y, absent)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.full_like(out_ref, absent)
        out_ref[:] = jnp.minimum(out_ref[:], y)


def k2_reduce(contrib, wa, wb, sstart, wa2, wb2, sec_mid, nmid, *,
              op="sum", interpret=False, sec_cls=None, levels=None):
    """Segment-reduce contributions into per-mid y blocks.

    contrib: (nsec*512, 128) in section order — f32 values, or int32
             fixed-point quanta for op="sum" when the caller (the
             engine sum path) pre-quantized x to round(x * 2**30);
             _k2_kernel dispatches on the dtype and skips the in-kernel
             quantize for int32 (bit-identical: round commutes with the
             gather).
    wa, wb:  (nsec*512, 128) uint16 packed Benes route 1 (slot order ->
             destination-sorted; bit 15 of wa = input pad).
    sstart:  (nsec*512, 128) uint16 segment-start positions (sorted
             layout, section-local).
    wa2, wb2:(nsec*512, 128) uint16 packed Benes route 2 (segment ends ->
             output positions; bit 15 of wa2 = output present).
    sec_mid: (nsec,) int32 mid of each section (prefetched; drives the
             revisited out block and the accumulator-reset flag).
    Returns (nmid*512, 128) int32; bit pattern per op (quanta / f32).

    Class mode (``sec_cls``/``levels`` not None): per-section scan
    depth.  sec_cls[k] indexes the static ``levels`` ladder of
    (lane_steps, row_steps) pairs (engine._k2_classes); the kernel runs
    each section's extra depth under scalar predication — one pallas
    call, no per-class dispatch, no re-streamed output block (see
    :func:`_segmented_scan_classed`).
    """
    sec_mid = sec_mid.astype(jnp.int32)
    nsec = contrib.shape[0] // SEC_R
    if sec_cls is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # sec_mid
            grid=(nsec,),
            in_specs=[pl.BlockSpec((SEC_R, 128), lambda k, sm: (k, 0))] * 6,
            out_specs=pl.BlockSpec((SEC_R, 128), lambda k, sm: (sm[k], 0)),
        )

        def kernel(sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref, wb2_ref,
                   out_ref):
            _k2_kernel(sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref,
                       wb2_ref, out_ref, op=op)

        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nmid * SEC_R, 128), jnp.int32),
            interpret=interpret,
        )(sec_mid, contrib, wa, wb, sstart, wa2, wb2)

    levels = tuple((int(l), int(r)) for l, r in levels)
    scan_dtype = jnp.float32 if op == "min" else jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # sec_cls, sec_mid
        grid=(nsec,),
        in_specs=[pl.BlockSpec((SEC_R, 128),
                               lambda k, cl, sm: (k, 0))] * 6,
        out_specs=pl.BlockSpec((SEC_R, 128),
                               lambda k, cl, sm: (sm[k], 0)),
        scratch_shapes=[pltpu.VMEM((SEC_R, 128), scan_dtype)] * 2,
    )

    def kernel(cls_ref, sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref,
               wb2_ref, out_ref, qs_ref, rn_ref):
        k = pl.program_id(0)
        _k2_kernel(sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref,
                   wb2_ref, out_ref, op=op, cls=cls_ref[k], levels=levels,
                   qs_ref=qs_ref, rn_ref=rn_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nmid * SEC_R, 128), jnp.int32),
        interpret=interpret,
    )(sec_cls.astype(jnp.int32), sec_mid, contrib, wa, wb, sstart, wa2, wb2)
