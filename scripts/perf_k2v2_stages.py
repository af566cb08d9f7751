"""K2v2 stage attribution on the REAL plan arrays (not synthetic).

Usage: python scripts/perf_k2v2_stages.py [scale] [relabel]

Variants (each a pallas kernel over the cached scale-N plan's actual
K2 streams, timed with in-jit chained reps):

  io      read all 6 streams, out += quantized v   (stream floor)
  route1  + Benes route 1                          (adds route cost)
  scan    + segmented scan                         (adds scan cost)
  full    + route 2 + present mask (the real K2)

The deltas attribute K2's ns/slot to IO vs route vs scan vs route2.
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

from graph_tpu.engine import kernels as K  # noqa: E402
from graph_tpu.engine.kernels import (  # noqa: E402
    FIXED_BITS, SEC_R, _benes, _segmented_scan)
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402
from perf_attr import CACHE, cached_rmat  # noqa: E402


def variant_kernel(mode):
    def kernel(sm_ref, v_ref, wa_ref, wb_ref, ss_ref, wa2_ref, wb2_ref,
               out_ref):
        k = pl.program_id(0)
        wa = wa_ref[:].astype(jnp.int32)
        v = v_ref[:]
        v = jnp.where((wa >> 15) == 1, 0.0, v)
        q = jnp.round(v * jnp.float32(1 << FIXED_BITS)).astype(jnp.int32)
        # touch every stream so the IO is identical across variants
        # (cast rows to i32 BEFORE the scalar extract: Mosaic supports
        # only 32-bit vector.extract)
        def sval(ref):
            return ref[0:8, :].astype(jnp.int32)[0, 0]

        touch = sval(wb_ref) + sval(ss_ref) + sval(wa2_ref) + sval(wb2_ref)
        if mode == "io":
            y = q + touch
        else:
            q = _benes(q, wa, wb_ref[:].astype(jnp.int32))
            if mode == "route1":
                y = q + touch
            else:
                S = _segmented_scan(q, ss_ref[:].astype(jnp.int32), "sum")
                if mode == "scan":
                    y = S + touch
                else:  # full
                    wa2 = wa2_ref[:].astype(jnp.int32)
                    y = _benes(S, wa2, wb2_ref[:].astype(jnp.int32))
                    y = jnp.where((wa2 >> 15) == 1, y, 0)

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
            # in-place chain: contrib is the loop carry, one-element update
            return c.at[0, 0].add(y[0, 0].astype(jnp.float32)
                                  * jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, contrib)

    r = loop(dev, contrib)
    np.asarray(r.reshape(-1)[0:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(dev, contrib)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    per = best / reps / contrib.size * 1e9
    print(f"{mode:7s}: {best*1e3:7.1f} ms x{reps} -> {per:.4f} ns/slot",
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
    last = 0.0
    for mode in ("io", "route1", "scan", "full"):
        per = run_variant(mode, dev, plan.nsec, plan.nmid, contrib)
        print(f"         delta {per-last:+.4f}")
        last = per


if __name__ == "__main__":
    main()
