"""Micro-bench: K1 window gather via sublane+lane 2-gather vs row scan.

The current K1 tile body resolves out[i,j] = w[hi[i,j], lo[i,j]] with a
3-VREG-op scan over the window's win/128 rows (broadcast, lane-taa,
select).  Mosaic also lowers an 8-deep SUBLANE gather
out[i,j] = t[idx[i,j], j] (idx.shape == operand.shape, <= 8 rows), so
each 8-row GROUP can instead pay: one sublane gather (hi & 7), one lane
taa (lo), one select on (hi >> 3) == g — ~3 ops per 8 rows instead of
24.  This script measures both on a synthetic full-block workload.

Usage: python scripts/perf_k1_sublane.py [win]
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

TILE = 1024
TPB = 16
BLK = TILE * TPB


def make_kernel(win, mode):
    def kernel(widx_ref, x_ref, out_ref):
        def tile_body(t, _):
            w = x_ref[pl.ds(0, win)].reshape(win // 128, 128)
            idx = widx_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)
            hi = idx >> 7
            lo = idx & 127
            acc = jnp.zeros((8, 128), jnp.float32)
            if mode == "rowscan":
                for h in range(win // 128):
                    row = jax.lax.broadcast_in_dim(w[h], (8, 128), (1,))
                    g = jnp.take_along_axis(row, lo, axis=1)
                    acc = jnp.where(hi == h, g, acc)
            else:
                hi3 = hi & 7
                grp = hi >> 3
                for g in range(win // 1024):
                    wg = w[g * 8:(g + 1) * 8, :]
                    u = jnp.take_along_axis(wg, hi3, axis=0)
                    v = jnp.take_along_axis(u, lo, axis=1)
                    if win == 1024:
                        acc = v
                    else:
                        acc = jnp.where(grp == g, v, acc)
            out_ref[pl.ds(t * 8, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, TPB, tile_body, 0, unroll=True)

    return kernel


def run(win, mode, nblk, widx, x):
    kernel = make_kernel(win, mode)
    f = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BLK // 128, 128), lambda k: (k, 0)),
                  pl.BlockSpec((win,), lambda k: (0,))],
        out_specs=pl.BlockSpec((BLK // 128, 128), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * BLK // 128, 128), jnp.float32),
    )
    return f(widx, x)


def main():
    wins = [int(a) for a in sys.argv[1:]] or [1024, 2048, 8192]
    rng = np.random.default_rng(0)
    nblk = 256  # 4M slots
    for win in wins:
        widx = jnp.asarray(
            rng.integers(0, win, size=(nblk * BLK // 128, 128)), jnp.uint16)
        x = jnp.asarray(rng.random(win), jnp.float32)
        ref = None
        for mode in ("rowscan", "sublane"):
            reps = 40
            @jax.jit
            def rep(widx, x):
                def body(i, c):
                    y = run(win, mode, nblk, widx, x)
                    return c + y[0, 0] * jnp.float32(1e-30)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            try:
                r = rep(widx, x)
                jax.block_until_ready(r)
            except Exception as e:
                print(f"win={win} {mode}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(rep(widx, x))
                best = min(best, time.perf_counter() - t0)
            per = best / (reps * nblk * BLK) * 1e9
            print(f"win={win} {mode}: {best*1e3:7.1f} ms -> {per:.4f} "
                  f"ns/slot", flush=True)
            # exactness: compare one pass
            y = np.asarray(run(win, mode, nblk, widx, x)[:128])
            if ref is None:
                ref = y
            else:
                ok = np.array_equal(ref, y)
                print(f"  exact match vs rowscan: {ok}", flush=True)


if __name__ == "__main__":
    main()
