"""Stage-by-stage K2 cost attribution on the real TPU.

perf_k2_io.py showed the 4-stream revisited-out pattern sustains
~558 GB/s — K2's 0.33 ns/edge is compute, not IO.  This times the real
K2 and synthetic kernels that add one stage at a time:

  io        4 streams in, += out (pure IO)
  route     + Benes stages (3 lane taa + 2 transposes + C-stage rolls)
  mxucsum   + MXU fixed-point cumsum + log-shift row scan (current sum)
  segscan   + masked log-shift segmented int32 scan (candidate)
  compact   + the current 64-tile dynamic-window compaction loop
  k2real    the actual production _k2_kernel (op="sum")
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEC_R, LANES = 512, 128
NSEC = 512
MID_EVERY = 16
R = 150


def timeit(fn, *args, reps=3):
    fn(*args)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name, kernel, n_in, with_meta=False, interpret=False):
    v = jnp.asarray(np.random.rand(NSEC * SEC_R, LANES).astype(np.float32))
    u16 = lambda lo, hi: jnp.asarray(
        np.random.randint(lo, hi, (NSEC * SEC_R, LANES)).astype(np.uint16))
    wa = u16(0, 1 << 14)
    wb = u16(0, 1 << 14)
    ci = u16(0, 1 << 14)
    sec_mid = jnp.asarray(np.arange(NSEC, dtype=np.int32) // MID_EVERY)
    # meta with plausible windows: ws2 ascending multiples of 1024, nsub=2
    meta = np.zeros((NSEC, 129), np.int32)
    meta[:, 0] = (np.arange(NSEC) % MID_EVERY == 0)
    meta[:, 1:65] = (np.arange(64) * 1024) // 1
    meta[:, 1:65] = np.minimum(meta[:, 1:65], 65536 - 8192)
    meta[:, 65:129] = 2
    meta = jnp.asarray(meta.reshape(-1))

    n_pref = 2 if with_meta else 1
    ins = [pl.BlockSpec((SEC_R, LANES), (lambda rr, k, *p: (k, 0)))] * n_in
    out_spec = pl.BlockSpec((SEC_R, LANES),
                            (lambda rr, k, sm, *p: (sm[k], 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref, grid=(R, NSEC), in_specs=ins,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((SEC_R, LANES), jnp.int32),
                        pltpu.VMEM((SEC_R, LANES), jnp.int32)],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NSEC // MID_EVERY * SEC_R, LANES),
                                       jnp.int32),
        interpret=interpret)
    pref = (sec_mid, meta)[:n_pref]
    args = pref + tuple((v, wa, wb, ci)[:n_in])
    f = jax.jit(lambda *a: call(*a))
    t = timeit(f, *args)
    edges = NSEC * SEC_R * LANES * R
    print(f"{name:12s} {t*1e3:8.1f} ms   {t/edges*1e9:7.4f} ns/slot")
    return t / edges * 1e9


def stage_route(v, wa, wb):
    wa_i = wa.astype(jnp.int32)
    v = jnp.where((wa_i >> 15) == 1, 0.0, v)
    v = jnp.take_along_axis(v, wa_i & 127, axis=1)
    y = jnp.swapaxes(v, 0, 1).reshape(SEC_R, 128)
    wb_i = wb.astype(jnp.int32)
    y = jnp.take_along_axis(y, wb_i & 127, axis=1)
    row_mod4 = jnp.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0), 3)
    delta = ((wb_i >> 7) & 3) - row_mod4
    yc = jnp.where(delta == 0, y, 0.0)
    for s in (1, 2, 3):
        yc = yc + jnp.where(delta == -s, pltpu.roll(y, s, 0), 0.0)
        yc = yc + jnp.where(delta == s, pltpu.roll(y, SEC_R - s, 0), 0.0)
    y = jnp.take_along_axis(yc, (wb_i >> 9) & 127, axis=1)
    v = jnp.swapaxes(y.reshape(128, SEC_R), 0, 1)
    v = jnp.take_along_axis(v, (wa_i >> 7) & 127, axis=1)
    return v


def stage_mxu_cumsum(v):
    q0 = jnp.round(v * jnp.float32(1 << 30)).astype(jnp.int32)
    q_lo = (q0 & 0x7FFF).astype(jnp.float32)
    q_hi = jax.lax.shift_right_arithmetic(q0, 15).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ut = (rr <= cc).astype(jnp.float32)
    cs_lo = jax.lax.dot_general(q_lo, ut, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    cs_hi = jax.lax.dot_general(q_hi, ut, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    q = cs_hi.astype(jnp.int32) * 32768 + cs_lo.astype(jnp.int32)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
    rt = jax.lax.broadcast_in_dim(q[:, 127], (SEC_R, 128), (0,))
    run = rt
    for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        run = run + jnp.where(rowid >= sh, pltpu.roll(run, sh, 0), 0)
    return q + (run - rt)


def stage_segscan_sum(v, ss):
    """Segmented int32 fixed-point sum scan via masked log shifts."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 1)
    rowstart = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0) * 128
    local_start = ss - rowstart
    q = jnp.round(v * jnp.float32(1 << 30)).astype(jnp.int32)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        cand = pltpu.roll(q, sh, 1)
        ok = (lane >= sh) & ((lane - sh) >= local_start)
        q = q + jnp.where(ok, cand, 0)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
    rv = jax.lax.broadcast_in_dim(q[:, 127], (SEC_R, 128), (0,))
    rs_row = jax.lax.broadcast_in_dim(ss[:, 127] // 128, (SEC_R, 128), (0,))
    run = rv
    for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        cand = pltpu.roll(run, sh, 0)
        ok = (rowid >= sh) & ((rowid - sh) >= rs_row)
        run = run + jnp.where(ok, cand, 0)
    carry = pltpu.roll(run, 1, 0)
    use_carry = (ss < rowstart) & (rowid > 0)
    return q + jnp.where(use_carry, carry, 0)


def k_io(sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref, c_ref, y_ref):
    acc = (v_ref[:].astype(jnp.int32) + wa_ref[:].astype(jnp.int32)
           + wb_ref[:].astype(jnp.int32) + ci_ref[:].astype(jnp.int32))

    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += acc


def k_route(sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref, c_ref, y_ref):
    v = stage_route(v_ref[:], wa_ref[:], wb_ref[:])
    acc = v.astype(jnp.int32) + ci_ref[:].astype(jnp.int32)

    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += acc


def k_mxucsum(sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref, c_ref, y_ref):
    v = stage_route(v_ref[:], wa_ref[:], wb_ref[:])
    c = stage_mxu_cumsum(v)
    acc = c + ci_ref[:].astype(jnp.int32)

    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += acc


def k_segscan(sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref, c_ref, y_ref):
    v = stage_route(v_ref[:], wa_ref[:], wb_ref[:])
    c = stage_segscan_sum(v, ci_ref[:].astype(jnp.int32))
    acc = c

    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += acc


def k_compact(meta_ref, sm_ref, v_ref, wa_ref, wb_ref, ci_ref, out_ref,
              c_ref, y_ref):
    # order of prefetch args: sec_mid first then meta (matches bench())
    sm_ref, meta_ref = meta_ref, sm_ref
    v = stage_route(v_ref[:], wa_ref[:], wb_ref[:])
    c_ref[:] = stage_mxu_cumsum(v)
    sec = pl.program_id(1)
    mbase = sec * 129
    cidx_ref = ci_ref

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
                    hsel = jnp.full((8, 128), h, jnp.int32)
                    rowv = jnp.take_along_axis(win, hsel, axis=0)
                    g = jnp.take_along_axis(rowv, lo, axis=1)
                    acc = jnp.where(hi == jj * 8 + h, g, acc)
                return acc

            acc = jax.lax.fori_loop(0, nsb, sub, jnp.zeros((8, 128), jnp.int32))
            y_ref[pl.ds(t * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, 16, quad_body, 0)

    @pl.when(sm_ref[pl.program_id(1)] % MID_EVERY == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += y_ref[:]


def main():
    base = bench("io", k_io, 4)
    rt = bench("route", k_route, 4)
    mx = bench("mxucsum", k_mxucsum, 4)
    sg = bench("segscan", k_segscan, 4)
    cp = bench("compact", k_compact, 4, with_meta=True)
    print(f"\nroute +{rt-base:.4f}  mxucsum +{mx-rt:.4f}  "
          f"segscan +{sg-rt:.4f}  compact +{cp-mx:.4f} ns/slot")


if __name__ == "__main__":
    main()
