"""K2 IO-floor probes: why do the 6 streams run at ~350 GB/s, not 490?

Usage: python scripts/perf_k2_io2.py [scale] [relabel]

Variants (pure IO + trivial compute, real plan arrays):
  io1         6 streams, (512,128) blocks, out revisited by sec_mid
  io1_fixout  same but out block pinned to 0 (isolates revisit cost)
  io1_4s      4 streams (drop wa2/wb2: 10 B/slot — byte scaling)
  io1_2s      2 streams (v + wa: 6 B/slot)
  io2         6 streams, (1024,128) double-height blocks (DMA size)
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


def run_variant(mode, dev, nsec, nmid, contrib):
    nstream = {"io1": 6, "io1_fixout": 6, "io1_4s": 4, "io1_2s": 2,
               "io2": 6}[mode]
    rows = SEC_R * (2 if mode == "io2" else 1)
    grid = nsec // (2 if mode == "io2" else 1)

    def sval(ref):
        return ref[0:8, :].astype(jnp.int32)[0, 0]

    def kernel(sm_ref, *refs):
        v_ref = refs[0]
        out_ref = refs[-1]
        k = pl.program_id(0)
        q = jnp.round(v_ref[:] * jnp.float32(1 << 30)).astype(jnp.int32)
        touch = jnp.int32(0)
        for r in refs[1:-1]:
            touch = touch + sval(r)
        first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:rows, :] += q + touch

    if mode == "io1_fixout":
        out_map = lambda k, sm: (0, 0)
    elif mode == "io2":
        out_map = lambda k, sm: (sm[2 * k] // 2, 0)
    else:
        out_map = lambda k, sm: (sm[k], 0)
    bs = pl.BlockSpec((rows, 128),
                      (lambda k, sm: (k, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[bs] * nstream,
        out_specs=pl.BlockSpec((rows, 128), out_map),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (max(nmid, 2) * rows, 128), jnp.int32))
    names = ["wa", "wb", "sstart", "wa2", "wb2"][: nstream - 1]
    reps = max(8, int(1.2e9 // (contrib.size)))

    @jax.jit
    def loop(dev, contrib):
        def body(i, c):
            y = call(dev["sec_mid"], c, *[dev[nm] for nm in names])
            return c.at[0, 0].add(y[0, 0].astype(jnp.float32)
                                  * jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, contrib)

    try:
        r = loop(dev, contrib)
        np.asarray(r.reshape(-1)[0:1])
    except Exception as exc:
        print(f"{mode:12s}: FAILED ({str(exc)[:140]})", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(dev, contrib)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    per = best / reps / contrib.size * 1e9
    bytes_slot = 4 + 2 * (nstream - 1)
    gbs = bytes_slot / per
    print(f"{mode:12s}: {best*1e3:7.1f} ms x{reps} -> {per:.4f} ns/slot "
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
    rng = np.random.default_rng(1)
    contrib = jnp.asarray(
        (rng.random((plan.nsec * SEC_R, 128)) * 1e-5).astype(np.float32))
    for mode in ("io1", "io1_fixout", "io1_4s", "io1_2s", "io2"):
        run_variant(mode, dev, plan.nsec, plan.nmid, contrib)


if __name__ == "__main__":
    main()
