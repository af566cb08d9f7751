"""K2 IO floor, measured honestly (round 4).

Fixes two flaws in the earlier probes (perf_k2_io2/io3/io4):
  1. they touched metadata refs as ``ref[0:8,:]`` — Mosaic may narrow
     the DMA to the accessed window, so "14 B/slot" was never moved;
     here every stream is read in full ((512,128) adds).
  2. the ~27 ms tunnel dispatch floor sat inside every number; here
     each variant runs at reps and 4*reps and reports the SLOPE
     (per-pass time with the floor cancelled).

Variants:
  read1   v only (4 B/slot)
  read2   v + wa (6 B/slot)
  read4   v + wa,wb,sstart (10 B/slot)
  read6   v + all 5 metadata streams (14 B/slot) = K2's exact IO
  read6n  read6 with out written per-step (never revisited)

Usage: python scripts/perf_k2_io5.py [scale]
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

from graph_tpu.engine.kernels import SEC_R  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402
from perf_attr import CACHE, cached_rmat  # noqa: E402


def run(label, loop16, loop64, contrib, args, reps, nslots, bytes_slot):
    def t(fn):
        r = fn(*args, contrib)
        np.asarray(r.reshape(-1)[0:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args, contrib)
            np.asarray(r.reshape(-1)[0:1])
            best = min(best, time.perf_counter() - t0)
        return best

    t16, t64 = t(loop16), t(loop64)
    per = (t64 - t16) / (3 * reps) / nslots * 1e9
    print(f"{label:8s}: {t16*1e3:7.1f}/{t64*1e3:7.1f} ms (x{reps}/x{4*reps})"
          f" -> slope {per:.4f} ns/slot ({bytes_slot} B/slot = "
          f"{bytes_slot/per:.0f} GB/s; floor~{t16*1e3 - (t64-t16)/3*1e3:.1f}"
          " ms)", flush=True)


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    src, dst = cached_rmat(scale)
    n = 1 << scale
    plan = load_or_build_plan(src, dst, n, cache_dir=f"{CACHE}/plans",
                              relabel="degree")
    print(f"nsec={plan.nsec} nslots={plan.nslots}", flush=True)
    dev = plan.device_arrays()
    nsec, nmid = plan.nsec, plan.nmid
    nslots = nsec * SEC_R * 128
    rng = np.random.default_rng(1)
    contrib = jnp.asarray(
        (rng.random((nsec * SEC_R, 128)) * 1e-5).astype(np.float32))
    names = ["wa", "wb", "sstart", "wa2", "wb2"]
    reps = max(8, int(1.2e9 // nslots))

    def mk(nstream, outmode="acc"):
        def kernel(sm_ref, *refs):
            v_ref, out_ref = refs[0], refs[-1]
            k = pl.program_id(0)
            q = jnp.round(v_ref[:] * jnp.float32(1 << 30)).astype(jnp.int32)
            for rf in refs[1:-1]:
                q = q + rf[:].astype(jnp.int32)  # full-block read
            if outmode == "acc":
                first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

                @pl.when(first)
                def _():
                    out_ref[:] = jnp.zeros_like(out_ref)
                out_ref[:] += q
            else:
                out_ref[:] = q

        bs = pl.BlockSpec((SEC_R, 128), lambda k, sm: (k, 0))
        out_map = ((lambda k, sm: (sm[k], 0)) if outmode == "acc"
                   else (lambda k, sm: (k % max(nmid, 2), 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nsec,),
            in_specs=[bs] * nstream,
            out_specs=pl.BlockSpec((SEC_R, 128), out_map))
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((max(nmid, 2) * SEC_R, 128),
                                           jnp.int32))

        def mk_loop(r):
            @jax.jit
            def loop(sm, *args):
                ins_, c = args[:-1], args[-1]

                def body(i, c):
                    y = call(sm, c, *ins_)
                    return c.at[0, 0].add(y[0, 0].astype(jnp.float32)
                                          * jnp.float32(1e-30))
                return jax.lax.fori_loop(0, r, body, c)
            return loop

        ins = [dev[nm] for nm in names[: nstream - 1]]
        return mk_loop(reps), mk_loop(4 * reps), ins

    for label, ns, om in (("read1", 1, "acc"), ("read2", 2, "acc"),
                          ("read4", 4, "acc"), ("read6", 6, "acc"),
                          ("read6n", 6, "step")):
        l16, l64, ins = mk(ns, om)
        run(label, l16, l64, contrib, [dev["sec_mid"]] + ins, reps, nslots,
            4 + 2 * (ns - 1))


if __name__ == "__main__":
    main()
