"""Stream-count / packing probe for the K2 IO floor.

The synthetic 4-stream kernel sustained ~558 GB/s; the real K2's
6-stream pattern measures ~322 GB/s.  This times the same total bytes
(14 B/slot) split across 6 / 4 / 2 input streams with the K2 grid
shape (N sections, revisited out block) to see whether stream COUNT
is the bottleneck — if so, packing wa+wb and wa2+wb2 into int32
streams is a free ~0.015 ns/slot.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_tpu import enable_compile_cache

enable_compile_cache()

SEC_R = 512
NSEC = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
MID_EVERY = 18


def bench(nstreams):
    # total input bytes per slot = 14 regardless of split
    if nstreams == 6:
        streams = [np.float32] + [np.uint16] * 5
    elif nstreams == 4:
        streams = [np.float32, np.int32, np.int32, np.uint16]
    else:  # 2
        streams = [np.float32, np.int32] + [np.int32]  # 12B only
    arrs = []
    rng = np.random.default_rng(0)
    for dt in streams:
        if dt == np.float32:
            a = (rng.random((NSEC * SEC_R, 128)) * 1e-5).astype(dt)
        else:
            a = rng.integers(0, 100, (NSEC * SEC_R, 128)).astype(dt)
        arrs.append(jnp.asarray(a))
    sec_mid = jnp.asarray(np.arange(NSEC, dtype=np.int32) // MID_EVERY)
    nmid = NSEC // MID_EVERY + 1
    nbytes = sum(a.dtype.itemsize for a in arrs)

    def kernel(sm_ref, *refs):
        out_ref = refs[-1]
        k = pl.program_id(0)
        acc = refs[0][:]
        for r in refs[1:-1]:
            acc = acc + r[0:8, :].astype(jnp.int32).astype(jnp.float32)[0, 0]
        first = (k == 0) | (sm_ref[k] != sm_ref[jnp.maximum(k - 1, 0)])

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NSEC,),
        in_specs=[pl.BlockSpec((SEC_R, 128), lambda k, sm: (k, 0))] * len(arrs),
        out_specs=pl.BlockSpec((SEC_R, 128), lambda k, sm: (sm[k], 0)))
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct(
                              (nmid * SEC_R, 128), jnp.float32))
    reps = 20

    @jax.jit
    def loop(sec_mid, *arrs):
        def body(i, a0):
            y = call(sec_mid, a0, *arrs[1:])
            return a0.at[0, 0].add(y[0, 0] * jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, arrs[0])

    r = loop(sec_mid, *arrs)
    np.asarray(r.reshape(-1)[0:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(sec_mid, *arrs)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    slots = NSEC * SEC_R * 128
    per = best / reps / slots * 1e9
    gbs = nbytes * slots * reps / best / 1e9
    print(f"{nstreams} streams ({nbytes}B/slot): {per:.4f} ns/slot, "
          f"{gbs:.0f} GB/s", flush=True)


for ns in (6, 4, 2):
    bench(ns)
