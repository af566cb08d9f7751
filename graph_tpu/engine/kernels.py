"""Pallas TPU kernels for the EdgeEngine.

K1 (gather): streams the plan's edge slots in (mid, src)-sorted order
and produces per-edge contributions ``x[src]`` via a windowed 8-way
select gather — the vectorized replacement for the reference's per-edge
pull loop (crates/algos/src/page_rank.rs:143-146).  Measured 0.055
ns/edge on v5e (vs 15 ns/edge for XLA's scalarized 1-D gather).

K2 (reduce): per 64K-edge section of one mid (64K destinations), routes
contributions through a build-time-computed Clos/Benes permutation
network into destination-sorted order inside VMEM, then segment-sums
them with an int32 fixed-point cumulative sum (wraparound-exact, same
trick as graph_tpu.ops.segment.segment_sum_fixedpoint) and a monotone
window compaction into per-destination cells.  This replaces the
reference's atomic scatter (crates/builder/src/graph/csr.rs:154-172)
and CAS loops — all conflicts were resolved on the host at plan-build
time.

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


def _k1_kernel(border_ref, sb_ref, ws_ref, x0_ref, x1_ref, x2_ref,
               widx_ref, out_ref, xs_ref, *, ew_ref=None, combine="none"):
    """Windowed gather; optionally combines a per-edge weight stream:
    combine="add" -> x[src] + w (tropical, SSSP relaxation),
    combine="mul" -> x[src] * w (weighted SpMV)."""
    xs_ref[0:SLICE] = x0_ref[:]
    xs_ref[SLICE:2 * SLICE] = x1_ref[:]
    xs_ref[2 * SLICE:] = x2_ref[:]
    blk = border_ref[pl.program_id(0)]

    def tile_body(t, _):
        start = pl.multiple_of(ws_ref[blk * TPB + t], 1024)
        w = xs_ref[pl.ds(start, WIN)].reshape(WIN // 128, 128)
        idx = widx_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)  # window-local
        hi = idx >> 7
        lo = idx & 127
        acc = jnp.zeros((8, 128), jnp.float32)
        for h in range(WIN // 128):
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


def k1_gather(x_padded, widx, border, sb, ws, *, weights=None,
              combine="add", interpret=False):
    """Per-edge gather: out[i] = x_padded[plan position of slot i].

    x_padded: (nx,) f32, nx a multiple of SLICE (>= (max(sb)+NSLICES)*SLICE).
    widx: (nslots//128, 128) uint16 tile-window-local positions (< WIN).
    border: (nblocks,) int32 slice-major block visit order (prefetched);
        grid step k processes block border[k], so each x slice streams
        through VMEM exactly once even though blocks of different mids
        revisit the same slices.
    sb: (nblocks,) int32 slice index of each block (prefetched).
    ws: (ntiles,) int32 window starts, slice-local, multiples of 1024.
    Returns (nslots//128, 128) f32 contributions.
    """
    nrows = widx.shape[0]
    nblk = nrows * 128 // BLK
    n_in = 4 if weights is None else 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((SLICE,), lambda k, bo, sb, ws: (sb[bo[k]],)),
            pl.BlockSpec((SLICE,), lambda k, bo, sb, ws: (sb[bo[k]] + 1,)),
            pl.BlockSpec((SLICE,), lambda k, bo, sb, ws: (sb[bo[k]] + 2,)),
        ] + [pl.BlockSpec((BLK // 128, 128),
                          lambda k, bo, sb, ws: (bo[k], 0))] * (n_in - 3),
        out_specs=pl.BlockSpec((BLK // 128, 128), lambda k, bo, sb, ws: (bo[k], 0)),
        scratch_shapes=[pltpu.VMEM((NSLICES * SLICE,), jnp.float32)],
    )
    if weights is None:
        def kernel(border_ref, sb_ref, ws_ref, x0, x1, x2, widx_ref,
                   out_ref, xs_ref):
            _k1_kernel(border_ref, sb_ref, ws_ref, x0, x1, x2, widx_ref,
                       out_ref, xs_ref)
        args = (border, sb, ws, x_padded, x_padded, x_padded, widx)
    else:
        def kernel(border_ref, sb_ref, ws_ref, x0, x1, x2, widx_ref,
                   ew_ref, out_ref, xs_ref):
            _k1_kernel(border_ref, sb_ref, ws_ref, x0, x1, x2, widx_ref,
                       out_ref, xs_ref, ew_ref=ew_ref, combine=combine)
        args = (border, sb, ws, x_padded, x_padded, x_padded, widx, weights)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
        interpret=interpret,
    )(*args)


INF = 3.0e38  # +inf stand-in (python literal; kernels cannot capture traced consts)
INF_BITS = 2137108966  # np.float32(INF).view(int32); IEEE order == int order for x >= 0


def _k2_kernel(meta_ref, v_ref, wa_ref, wb_ref, cidx_ref, out_ref, c_ref,
               y_ref, *, op="sum", ss_ref=None):
    """Per-section: Benes route -> segment reduce -> compact -> accumulate.

    op="sum": int32 fixed-point cumulative sums (wraparound-exact).
    op="min": f32 segmented min-scan over build-time segment starts
              (ss_ref, uint16 sorted-layout positions).
    meta layout per section (int32): [first_of_mid, ws2[64], nsub[64]] = 129.
    """
    sec = pl.program_id(0)
    mbase = sec * 129

    wa = wa_ref[:].astype(jnp.int32)
    v = v_ref[:]
    v = jnp.where((wa >> 15) == 1, 0.0 if op == "sum" else INF, v)

    # ---- Benes stages (A, T, B, C, D, T', E)
    v = jnp.take_along_axis(v, wa & 127, axis=1)
    y = jnp.swapaxes(v, 0, 1).reshape(SEC_R, 128)
    wb = wb_ref[:].astype(jnp.int32)
    y = jnp.take_along_axis(y, wb & 127, axis=1)
    # C stage: out[r] = in[(r & ~3) | g]; shift delta in [-3, 3] via rolls
    row_mod4 = jnp.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0), 3)
    delta = ((wb >> 7) & 3) - row_mod4
    yc = jnp.where(delta == 0, y, 0.0)
    for s in (1, 2, 3):
        yc = yc + jnp.where(delta == -s, pltpu.roll(y, s, 0), 0.0)
        yc = yc + jnp.where(delta == s, pltpu.roll(y, SEC_R - s, 0), 0.0)
    y = jnp.take_along_axis(yc, (wb >> 9) & 127, axis=1)
    v = jnp.swapaxes(y.reshape(128, SEC_R), 0, 1)
    v = jnp.take_along_axis(v, (wa >> 7) & 127, axis=1)
    # v is destination-sorted (lead pad first, tail pads last)

    lane = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 1)
    if op == "sum":
        # ---- int32 fixed-point inclusive cumsum over the flat section.
        # Lane cumsum on the MXU: split q into two 15-bit halves (exact
        # in f32), multiply by an upper-triangular ones matrix (row sums
        # stay below 2**24 so the f32 accumulation is exact), recombine
        # in int32 (wraparound keeps totals exact mod 2**32).
        q0 = jnp.round(v * jnp.float32(1 << FIXED_BITS)).astype(jnp.int32)
        q_lo = (q0 & 0x7FFF).astype(jnp.float32)
        q_hi = jax.lax.shift_right_arithmetic(q0, 15).astype(jnp.float32)
        rr = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ut = (rr <= cc).astype(jnp.float32)
        # HIGHEST precision (bf16x3+) makes the <=15-bit integer
        # products and <2**24 f32 accumulations exact; the default
        # single-pass bf16 mode silently rounds the 15-bit halves.
        cs_lo = jax.lax.dot_general(q_lo, ut, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        cs_hi = jax.lax.dot_general(q_hi, ut, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        q = cs_hi.astype(jnp.int32) * 32768 + cs_lo.astype(jnp.int32)
        # Row-offset scan on full (512,128) shapes: Mosaic executes
        # sub-sublane shapes like (4,128)/(512,1) via relayout storms
        # (~250ns/op); full-size rolls are ~free.
        rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
        rt = jax.lax.broadcast_in_dim(q[:, 127], (SEC_R, 128), (0,))
        run = rt
        for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            run = run + jnp.where(rowid >= sh, pltpu.roll(run, sh, 0), 0)
        c_ref[:] = q + (run - rt)
    else:
        # ---- f32 segmented min-scan: S[i] = min v over [sstart[i], i].
        # Level 1: within rows of 128 (masked log shifts; combining at
        # distance sh is valid iff i-sh is in the same segment, i.e.
        # i - sh >= sstart[i] -- positions of one segment share sstart).
        ss = ss_ref[:].astype(jnp.int32)            # absolute start pos
        rowstart = (jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
                    * 128)
        local_start = ss - rowstart                  # may be negative
        q = v
        for sh in (1, 2, 4, 8, 16, 32, 64):
            cand = pltpu.roll(q, sh, 1)
            ok = (lane >= sh) & ((lane - sh) >= local_start)
            q = jnp.minimum(q, jnp.where(ok, cand, INF))
        # q[r, l] = min over [max(sstart, r*128), r*128+l]
        # Level 2: row carries, as a single masked log-shift scan over
        # all 512 row-end values on full (512,128) shapes.  Row-level
        # segment key: the row where the segment covering THIS row's
        # END starts (rows of one segment share it; combining at
        # distance sh is valid iff row-sh >= that key — same purity
        # argument as the lane scan).
        rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
        rv = jax.lax.broadcast_in_dim(q[:, 127], (SEC_R, 128), (0,))
        rs_row = jax.lax.broadcast_in_dim(ss[:, 127] // 128,
                                          (SEC_R, 128), (0,))
        run = rv
        for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            cand = pltpu.roll(run, sh, 0)
            ok = (rowid >= sh) & ((rowid - sh) >= rs_row)
            run = jnp.minimum(run, jnp.where(ok, cand, INF))
        # carry into each row = previous row's inclusive scan value
        carry = pltpu.roll(run, 1, 0)
        use_carry = (ss < rowstart) & (rowid > 0)
        S = jnp.minimum(q, jnp.where(use_carry, carry, INF))
        c_ref[:] = pltpu.bitcast(S, jnp.int32)

    # ---- monotone window compaction: cells[d] = C[e_d]
    # 4 cell tiles per loop step to amortize the scalar-unit loop cost.
    def quad_body(t4, _):
        for u in range(4):
            t = t4 * 4 + u
            base = pl.multiple_of(meta_ref[mbase + 1 + t], 1024)
            nsb = meta_ref[mbase + 65 + t]
            local = cidx_ref[pl.ds(t * 8, 8), :].astype(jnp.int32) - base
            hi = local >> 7
            lo = local & 127

            def sub(jj, acc, base=base, hi=hi, lo=lo):
                row0 = pl.multiple_of(base // 128 + jj * 8, 8)
                win = c_ref[pl.ds(row0, 8), :]
                for h in range(8):
                    # broadcast row h via a constant sublane gather:
                    # full-(8,128) ops avoid Mosaic's slow sub-shape
                    # slice+broadcast path
                    hsel = jnp.full((8, 128), h, jnp.int32)
                    rowv = jnp.take_along_axis(win, hsel, axis=0)
                    g = jnp.take_along_axis(rowv, lo, axis=1)
                    acc = jnp.where(hi == jj * 8 + h, g, acc)
                return acc

            acc = jax.lax.fori_loop(
                0, nsb, sub, jnp.zeros((8, 128), jnp.int32))
            y_ref[pl.ds(t * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, 16, quad_body, 0)
    cells = y_ref[:]

    # ---- flat shift-by-one of the cell index stream (for presence /
    # difference against the previous destination's cell)
    ci = cidx_ref[:].astype(jnp.int32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)

    def shift_flat(a, fill):
        prev_rows = pltpu.roll(a, 1, 0)
        lane_sh = pltpu.roll(a, 1, 1)
        col0 = prev_rows[:, 127:128]
        sh = jnp.where(lane == 0, col0, lane_sh)
        return jnp.where((lane == 0) & (row_ids == 0), fill, sh)

    # The mid accumulator is int32 so cross-section accumulation stays
    # exact: sum accumulates fixed-point quanta (wraparound-exact); min
    # compares f32 bit patterns (IEEE order == integer order for
    # nonnegative values, which labels/distances/contributions are).
    if op == "sum":
        y_add = cells - shift_flat(cells, 0)

        @pl.when(meta_ref[mbase] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += y_add
    else:
        # destination present in this section iff its segment end moved
        present = ci > shift_flat(ci, -1)
        y_min = jnp.where(present, cells, INF_BITS)

        @pl.when(meta_ref[mbase] == 1)
        def _():
            out_ref[:] = jnp.full_like(out_ref, INF_BITS)
        out_ref[:] = jnp.minimum(out_ref[:], y_min)


def k2_reduce(contrib, wa, wb, cidx, meta, sec_mid, nmid, *, op="sum",
              sstart=None, interpret=False):
    """Segment-sum contributions into per-mid y blocks.

    contrib: (nsec*512, 128) f32 in section order.
    wa, wb:  (nsec*512, 128) uint16 packed Benes routing.
    cidx:    (nsec*512, 128) uint16 compaction cell indices.
    meta:    (nsec*129,) int32 prefetch: per section [first, ws2[64], nsub[64]].
    sec_mid: (nsec,) int32 mid of each section (prefetched via closure-free
             indexing: baked into the out index_map through the meta array).
    Returns (nmid*512, 128) f32; reshape(-1)[:n] is y.
    """
    nsec = contrib.shape[0] // SEC_R
    sec_mid = sec_mid.astype(jnp.int32)
    n_in = 4 if op == "sum" else 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # sec_mid, meta
        grid=(nsec,),
        in_specs=[pl.BlockSpec((SEC_R, 128), lambda k, sm, mt: (k, 0))] * n_in,
        out_specs=pl.BlockSpec((SEC_R, 128), lambda k, sm, mt: (sm[k], 0)),
        scratch_shapes=[
            pltpu.VMEM((SEC_R, 128), jnp.int32),
            pltpu.VMEM((SEC_R, 128), jnp.int32),
        ],
    )

    if op == "sum":
        def kernel(sm_ref, meta_ref, v_ref, wa_ref, wb_ref, cidx_ref,
                   out_ref, c_ref, y_ref):
            _k2_kernel(meta_ref, v_ref, wa_ref, wb_ref, cidx_ref, out_ref,
                       c_ref, y_ref, op="sum")
        args = (sec_mid, meta, contrib, wa, wb, cidx)
    else:
        def kernel(sm_ref, meta_ref, v_ref, wa_ref, wb_ref, cidx_ref,
                   ss_ref, out_ref, c_ref, y_ref):
            _k2_kernel(meta_ref, v_ref, wa_ref, wb_ref, cidx_ref, out_ref,
                       c_ref, y_ref, op="min", ss_ref=ss_ref)
        args = (sec_mid, meta, contrib, wa, wb, cidx, sstart)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nmid * SEC_R, 128), jnp.int32),
        interpret=interpret,
    )(*args)
