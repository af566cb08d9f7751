"""K2 IO probes round 4b: separate per-call structure from stream rate.

perf_k2_io3 measured 357 GB/s reads for ANY 6-stream variant (merged,
deep blocks, per-step out) with a ~0.87 ms fixed cost per rep, while
round-2's perf_k2_io (200 grid-repetitions inside ONE pallas call on
350 MB of synthetic arrays) saw 558 GB/s.  Variants here:

  ctrl_carry  fori_loop body is ONLY c.at[0,0].add (no pallas): is the
              carry update a full-array copy or in-place?
  multipass   grid=(r, nsec) single call, real plan arrays, 6 streams
              (round-2 structure on round-3 data)
  multipass1  same but 1 input stream (v) only
  onepass     copy6 control from io3 (fori_loop of full passes)
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


def bench(label, fn, *args, per_bytes=None, passes=1, nslots=1):
    def fence(r):  # block_until_ready does not fence on the tunnel
        np.asarray(r.reshape(-1)[0:1])

    r = fn(*args)
    fence(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        fence(r)
        best = min(best, time.perf_counter() - t0)
    per = best / passes / nslots * 1e9
    msg = f"{label:12s}: {best*1e3:8.1f} ms"
    if per_bytes:
        msg += (f" -> {per:.4f} ns/slot ({per_bytes} B/slot = "
                f"{per_bytes/per:.0f} GB/s)")
    print(msg, flush=True)


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

    # --- ctrl_carry: the fori_loop carry update alone
    @jax.jit
    def ctrl(c):
        def body(i, c):
            return c.at[0, 0].add(jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, c)

    bench("ctrl_carry", ctrl, contrib, passes=reps, nslots=nslots,
          per_bytes=None)

    # --- multipass: r passes inside one pallas grid
    def mk_multipass(nstream, r):
        def kernel(sm_ref, *refs):
            v_ref, out_ref = refs[0], refs[-1]
            k = pl.program_id(1)
            q = jnp.round(v_ref[:] * jnp.float32(1 << 30)).astype(jnp.int32)
            touch = jnp.int32(0)
            for rf in refs[1:-1]:
                touch = touch + rf[0:8, :].astype(jnp.int32)[0, 0]
            first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

            @pl.when(first)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += q + touch

        bs = pl.BlockSpec((SEC_R, 128), lambda rr, k, sm: (k, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r, nsec),
            in_specs=[bs] * nstream,
            out_specs=pl.BlockSpec((SEC_R, 128),
                                   lambda rr, k, sm: (sm[k], 0)),
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((max(nmid, 2) * SEC_R, 128),
                                           jnp.int32))
        ins = [dev[nm] for nm in names[: nstream - 1]]
        f = jax.jit(lambda sm, c, *ii: call(sm, c, *ii))
        return lambda c: f(dev["sec_mid"], c, *ins)

    r = max(4, reps)
    f6 = mk_multipass(6, r)
    bench("multipass6", f6, contrib, per_bytes=14, passes=r, nslots=nslots)
    f1 = mk_multipass(1, r)
    bench("multipass1", f1, contrib, per_bytes=4, passes=r, nslots=nslots)

    # --- onepass control (io3 copy6)
    def mk_onepass(nstream):
        def kernel(sm_ref, *refs):
            v_ref, out_ref = refs[0], refs[-1]
            k = pl.program_id(0)
            q = jnp.round(v_ref[:] * jnp.float32(1 << 30)).astype(jnp.int32)
            touch = jnp.int32(0)
            for rf in refs[1:-1]:
                touch = touch + rf[0:8, :].astype(jnp.int32)[0, 0]
            first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

            @pl.when(first)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += q + touch

        bs = pl.BlockSpec((SEC_R, 128), lambda k, sm: (k, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsec,),
            in_specs=[bs] * nstream,
            out_specs=pl.BlockSpec((SEC_R, 128), lambda k, sm: (sm[k], 0)),
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((max(nmid, 2) * SEC_R, 128),
                                           jnp.int32))
        ins = [dev[nm] for nm in names[: nstream - 1]]

        @jax.jit
        def loop(sm, c, *ii):
            def body(i, c):
                y = call(sm, c, *ii)
                return c.at[0, 0].add(y[0, 0].astype(jnp.float32)
                                      * jnp.float32(1e-30))
            return jax.lax.fori_loop(0, reps, body, c)

        return lambda c: loop(dev["sec_mid"], c, *ins)

    bench("onepass6", mk_onepass(6), contrib, per_bytes=14, passes=reps,
          nslots=nslots)


if __name__ == "__main__":
    main()
