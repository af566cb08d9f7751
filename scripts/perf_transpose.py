"""Isolate Mosaic transpose cost: (512,128)<->(128,512) vs (128,128).

The sec128 A/B (perf_k2_sec128.py) came out SLOWER despite ~half the
VREG ops; prime suspect is the transpose: if one swapaxes costs ~fixed
time regardless of shape, four (128,128) transposes per 16K slots cost
4x per slot what the (512,128) form pays per 64K slots.
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

NSEC = 128
NS = NSEC * 512 * 128


def mk(body):
    def kernel(v_ref, out_ref):
        out_ref[:] = body(v_ref[:])

    call = pl.pallas_call(
        kernel,
        grid=(NSEC,),
        in_specs=[pl.BlockSpec((512, 128), lambda k: (k, 0))],
        out_specs=pl.BlockSpec((512, 128), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((NSEC * 512, 128), jnp.int32),
    )

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def loop(r, c):
        def b(i, c):
            y = call(c)
            return c.at[0, 0].add(y[0, 0] & 1)
        return jax.lax.fori_loop(0, r, b, c)
    return loop


def body_copy(v):
    return v + 1


def body_t512(v):
    y = jnp.swapaxes(v, 0, 1).reshape(512, 128)
    return jnp.swapaxes(y.reshape(128, 512), 0, 1)


def body_t128x4(v):
    outs = []
    for q in range(4):
        s = v[q * 128:(q + 1) * 128, :]
        y = jnp.swapaxes(s, 0, 1)
        outs.append(jnp.swapaxes(y, 0, 1) + 1)
    return jnp.concatenate(outs, axis=0)


def body_taa512(v):
    idx = (jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1) + 5) % 128
    return jnp.take_along_axis(v, idx, axis=1)


def body_taa128x4(v):
    idx = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) + 5) % 128
    outs = []
    for q in range(4):
        outs.append(jnp.take_along_axis(v[q * 128:(q + 1) * 128, :], idx,
                                        axis=1))
    return jnp.concatenate(outs, axis=0)


def main():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.integers(0, 100, size=(NSEC * 512, 128),
                                 dtype=np.int64).astype(np.int32))
    reps = 120
    for name, body in (("copy", body_copy), ("t512x2", body_t512),
                       ("t128x8", body_t128x4), ("taa512", body_taa512),
                       ("taa128x4", body_taa128x4)):
        loop = mk(body)
        y = loop(reps, c)
        np.asarray(y.reshape(-1)[0:1])
        best = float("inf")
        for r in (reps, 4 * reps):
            t_r = float("inf")
            yy = loop(r, c)
            np.asarray(yy.reshape(-1)[0:1])
            for _ in range(3):
                t0 = time.perf_counter()
                yy = loop(r, c)
                np.asarray(yy.reshape(-1)[0:1])
                t_r = min(t_r, time.perf_counter() - t0)
            if r == reps:
                t1 = t_r
            else:
                t4 = t_r
        per = (t4 - t1) / (3 * reps) / NS * 1e9
        print(f"{name:9s}: {per:.4f} ns/slot", flush=True)


if __name__ == "__main__":
    main()
