"""K2 IO-floor probes round 4: what sets the ~355 GB/s stream ceiling?

Usage: python scripts/perf_k2_io3.py [scale] [relabel]

Round-3 established (perf_k2_io2): 6 vs 4 streams identical ns/slot,
(1024,128) double blocks no better, pinned out no better.  That pattern
(bytes don't matter, DMA size doesn't matter) suggests a per-grid-step
or per-stream-issue bound, not bandwidth.  These variants separate the
hypotheses:

  copy1      1-in/1-out copy, (512,128) int32 blocks     (calibration)
  copy6      6-in/1-out, adds int32 of all streams        (= io1 shape)
  copy6w     same 6-in but ONE merged (512,768) uint16 stream + v
  copy6deep  6-in, 4 sections per grid step (2048,128)
  copy6sk    6-in, out written per step k (never revisited/accumulated)
  copy6noq   6-in with NO compute at all (just copies v)
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


def timeit(loop, dev_args, contrib, reps, nslots, bytes_slot, name):
    try:
        r = loop(*dev_args, contrib)
        np.asarray(r.reshape(-1)[0:1])
    except Exception as exc:
        print(f"{name:10s}: FAILED ({str(exc)[:160]})", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(*dev_args, contrib)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    per = best / reps / nslots * 1e9
    gbs = bytes_slot / per
    print(f"{name:10s}: {best*1e3:7.1f} ms x{reps} -> {per:.4f} ns/slot "
          f"({bytes_slot} B/slot = {gbs:.0f} GB/s)", flush=True)
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
    nsec, nmid = plan.nsec, plan.nmid
    nslots = nsec * SEC_R * 128
    rng = np.random.default_rng(1)
    contrib = jnp.asarray(
        (rng.random((nsec * SEC_R, 128)) * 1e-5).astype(np.float32))
    names = ["wa", "wb", "sstart", "wa2", "wb2"]
    # merged metadata: one (nsec*512, 640) uint16 array
    merged = jnp.concatenate([dev[nm] for nm in names], axis=1)
    reps = max(8, int(1.2e9 // nslots))

    def mk(nstream, rows_per, outmode, compute, merged_meta=False):
        grid = nsec // (rows_per // SEC_R)

        def kernel(sm_ref, *refs):
            v_ref = refs[0]
            out_ref = refs[-1]
            k = pl.program_id(0)
            if compute:
                q = jnp.round(v_ref[:] * jnp.float32(1 << 30)).astype(jnp.int32)
            else:
                q = pltpu.bitcast(v_ref[:], jnp.int32)
            touch = jnp.int32(0)
            for r in refs[1:-1]:
                touch = touch + r[0:8, :].astype(jnp.int32)[0, 0]
            if outmode == "acc":
                first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

                @pl.when(first)
                def _():
                    out_ref[:] = jnp.zeros_like(out_ref)
                out_ref[:] += q[:SEC_R, :] + touch
            else:
                out_ref[:] = q[:SEC_R, :] + touch

        step = rows_per // SEC_R
        bs_in = pl.BlockSpec((rows_per, 128), lambda k, sm: (k, 0))
        if merged_meta:
            in_specs = [bs_in, pl.BlockSpec((rows_per, 640),
                                            lambda k, sm: (k, 0))]
        else:
            in_specs = [bs_in] * nstream
        if outmode == "acc":
            out_map = (lambda k, sm: (sm[k * step], 0))
        else:
            out_map = (lambda k, sm: (k % max(nmid, 2), 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((SEC_R, 128), out_map),
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((max(nmid, 2) * SEC_R, 128),
                                           jnp.int32))
        if merged_meta:
            ins = [merged]
        else:
            ins = [dev[nm] for nm in names[: nstream - 1]]

        @jax.jit
        def loop(sec_mid, *args):
            ins_, c = args[:-1], args[-1]

            def body(i, c):
                y = call(sec_mid, c, *ins_)
                return c.at[0, 0].add(y[0, 0].astype(jnp.float32)
                                      * jnp.float32(1e-30))
            return jax.lax.fori_loop(0, reps, body, c)

        return loop, ins

    # calibration copy: 1 stream in + out per-step
    loop, ins = mk(1, SEC_R, "step", False)
    timeit(loop, [dev["sec_mid"]] + ins, contrib, reps, nslots, 8, "copy1")
    loop, ins = mk(6, SEC_R, "acc", True)
    timeit(loop, [dev["sec_mid"]] + ins, contrib, reps, nslots, 14, "copy6")
    loop, ins = mk(6, SEC_R, "acc", True, merged_meta=True)
    timeit(loop, [dev["sec_mid"]] + ins, contrib, reps, nslots, 14, "copy6w")
    loop, ins = mk(6, 4 * SEC_R, "acc", True)
    timeit(loop, [dev["sec_mid"]] + ins, contrib, reps, nslots, 14,
           "copy6deep")
    loop, ins = mk(6, SEC_R, "step", True)
    timeit(loop, [dev["sec_mid"]] + ins, contrib, reps, nslots, 14, "copy6sk")
    loop, ins = mk(6, SEC_R, "acc", False)
    timeit(loop, [dev["sec_mid"]] + ins, contrib, reps, nslots, 14, "copy6noq")


if __name__ == "__main__":
    main()
