"""Micro-attribution of the K2 Benes route's op classes on real arrays.

Usage: python scripts/perf_k2_route_ops.py [scale] [relabel]

Times cumulative variants of route 1 over the cached scale-N plan's
actual streams, isolating: lane taa cost, transpose cost, the C stage
as rolls (current) vs as a grouped sublane take_along_axis (candidate:
Mosaic lowers 8-deep sublane gathers natively; the C stage permutes
only within 4-row groups, so idx = (row & ~3) | ((wb >> 7) & 3) stays
inside each 8-row VREG group).  Also isolates route2 run WITHOUT
route1+scan before it (composition/register-pressure probe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_tpu import enable_compile_cache

enable_compile_cache()

from graph_tpu.engine.kernels import SEC_R, _benes  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402
from perf_attr import CACHE, cached_rmat  # noqa: E402


def c_stage_roll(y, wb):
    row_mod4 = jnp.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0), 3)
    delta = ((wb >> 7) & 3) - row_mod4
    zero = jnp.zeros((), y.dtype)
    yc = jnp.where(delta == 0, y, zero)
    for s in (1, 2, 3):
        yc = yc + jnp.where(delta == -s, pltpu.roll(y, s, 0), zero)
        yc = yc + jnp.where(delta == s, pltpu.roll(y, SEC_R - s, 0), zero)
    return yc


def c_stage_taa(y, wb):
    row = jax.lax.broadcasted_iota(jnp.int32, (SEC_R, 128), 0)
    idx = (row & ~3) | ((wb >> 7) & 3)
    return jnp.take_along_axis(y, idx, axis=0)


def variant_kernel(mode):
    def kernel(sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref, wb2_ref,
               out_ref):
        k = pl.program_id(0)
        wa = wa_ref[:].astype(jnp.int32)
        wb = wb_ref[:].astype(jnp.int32)
        v = v_ref[:]
        q = jnp.round(v * jnp.float32(1 << 30)).astype(jnp.int32)

        def sval(ref):
            return ref[0:8, :].astype(jnp.int32)[0, 0]

        touch = sval(ss_ref) + sval(wa2_ref) + sval(wb2_ref)
        if mode == "io":
            y = q + touch
        elif mode == "taa1":
            y = jnp.take_along_axis(q, wa & 127, axis=1) + touch
        elif mode == "taa2":
            y = jnp.take_along_axis(q, wa & 127, axis=1)
            y = jnp.take_along_axis(y, wb & 127, axis=1) + touch
        elif mode == "transpose":
            y = jnp.take_along_axis(q, wa & 127, axis=1)
            y = jnp.swapaxes(y, 0, 1).reshape(SEC_R, 128)
            y = jnp.take_along_axis(y, wb & 127, axis=1) + touch
        elif mode == "c_roll":
            y = jnp.take_along_axis(q, wa & 127, axis=1)
            y = jnp.swapaxes(y, 0, 1).reshape(SEC_R, 128)
            y = jnp.take_along_axis(y, wb & 127, axis=1)
            y = c_stage_roll(y, wb) + touch
        elif mode == "c_taa":
            y = jnp.take_along_axis(q, wa & 127, axis=1)
            y = jnp.swapaxes(y, 0, 1).reshape(SEC_R, 128)
            y = jnp.take_along_axis(y, wb & 127, axis=1)
            y = c_stage_taa(y, wb) + touch
        elif mode == "route1":
            y = _benes(q, wa, wb) + touch
        elif mode == "route2only":
            wa2 = wa2_ref[:].astype(jnp.int32)
            y = _benes(q, wa2, wb2_ref[:].astype(jnp.int32)) + sval(wb_ref)
        elif mode == "both_routes":
            y = _benes(q, wa, wb)
            wa2 = wa2_ref[:].astype(jnp.int32)
            y = _benes(y, wa2, wb2_ref[:].astype(jnp.int32)) + sval(ss_ref)
        first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += y
    return kernel


def run_variant(mode, dev, nsec, nmid, contrib):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsec,),
        in_specs=[pl.BlockSpec((SEC_R, 128), lambda k, sm: (k, 0))] * 6,
        out_specs=pl.BlockSpec((SEC_R, 128), lambda k, sm: (sm[k], 0)),
    )
    call = pl.pallas_call(
        variant_kernel(mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nmid * SEC_R, 128), jnp.int32))
    reps = max(8, int(1.2e9 // (contrib.size)))

    @jax.jit
    def loop(dev, contrib):
        def body(i, c):
            y = call(dev["sec_mid"], c, dev["wa"], dev["wb"], dev["sstart"],
                     dev["wa2"], dev["wb2"])
            return c.at[0, 0].add(y[0, 0].astype(jnp.float32)
                                  * jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, contrib)

    try:
        r = loop(dev, contrib)
        np.asarray(r.reshape(-1)[0:1])
    except Exception as exc:
        print(f"{mode:12s}: FAILED ({type(exc).__name__}: "
              f"{str(exc)[:160]})", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(dev, contrib)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    per = best / reps / contrib.size * 1e9
    print(f"{mode:12s}: {best*1e3:7.1f} ms x{reps} -> {per:.4f} ns/slot",
          flush=True)
    return per


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    relabel = sys.argv[2] if len(sys.argv) > 2 else "degree"
    relabel = None if relabel == "none" else relabel
    src, dst = cached_rmat(scale)
    n = 1 << scale
    plan = load_or_build_plan(src, dst, n, cache_dir=f"{CACHE}/plans",
                              relabel=relabel)
    print(f"nsec={plan.nsec} nslots={plan.nslots}", flush=True)
    dev = plan.device_arrays()
    rng = np.random.default_rng(1)
    contrib = jnp.asarray(
        (rng.random((plan.nsec * SEC_R, 128)) * 1e-5).astype(np.float32))
    # correctness probe for the grouped sublane taa (vs the roll form)
    y0 = np.arange(SEC_R * 128, dtype=np.int32).reshape(SEC_R, 128)
    wb0 = np.asarray(dev["wb"][:SEC_R]).astype(np.int32)
    exp = np.take_along_axis(
        y0, (np.arange(SEC_R)[:, None] & ~3) | ((wb0 >> 7) & 3), axis=0)
    modes = ["io", "taa1", "taa2", "transpose", "c_roll", "c_taa",
             "route1", "route2only", "both_routes"]
    try:
        got = jax.jit(lambda y, wb: pl.pallas_call(
            lambda y_ref, wb_ref, o_ref: o_ref.__setitem__(
                slice(None), c_stage_taa(y_ref[:], wb_ref[:])),
            out_shape=jax.ShapeDtypeStruct((SEC_R, 128), jnp.int32))(y, wb))(
                jnp.asarray(y0), jnp.asarray(wb0))
        ok = np.array_equal(np.asarray(got), exp)
        print(f"c_taa exactness: {'OK' if ok else 'MISMATCH'}", flush=True)
    except Exception as exc:
        print(f"c_taa: does not lower ({str(exc)[:120]})", flush=True)
        modes.remove("c_taa")
    last = 0.0
    for mode in modes:
        per = run_variant(mode, dev, plan.nsec, plan.nmid, contrib)
        if per is not None:
            print(f"             delta {per-last:+.4f}")
            last = per


if __name__ == "__main__":
    main()
