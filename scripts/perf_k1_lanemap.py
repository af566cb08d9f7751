"""Micro-bench: K1 "lanemap" gather — per-lane window-row stream.

Composition fact: chaining taa(axis=0) then taa(axis=1) yields
out[i,j] = w[A[i, lo[i,j]], lo[i,j]] — the row index is evaluated at
the FINAL lane.  So if the plan places slots such that, per VREG row i,
all slots with window lane l share one window row A[i,l], the stream
can carry A (per-lane, bits 8..14) + lo (per-slot, bits 0..6) in the
one u16, and the gather needs 2 ops per 8-row group + 1 final lane taa
— no rowmatch placement needed (duplicates of one src are free).

Also measures the native depth limit of taa(axis=0): operands of
8/16/32/128 rows.

Usage: python scripts/perf_k1_lanemap.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

TILE, TPB = 1024, 16
BLK = TILE * TPB

def depth_probe():
    """Cost of taa(axis=0) vs operand rows."""
    for rows in (8, 16, 32, 128):
        def kernel(r_ref, t_ref, out_ref, rows=rows):
            def body(t, _):
                idx = r_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)
                out_ref[pl.ds(t * 8, 8), :] = jnp.take_along_axis(
                    t_ref[0:rows, :], idx % rows, axis=0)[0:8]
                return 0
            jax.lax.fori_loop(0, TPB, body, 0, unroll=True)
        nblk = 256
        rng = np.random.default_rng(0)
        ridx = jnp.asarray(rng.integers(0, rows, (nblk * BLK // 128, 128)), jnp.uint16)
        t = jnp.asarray(rng.random((rows, 128)), jnp.float32)
        try:
            f = pl.pallas_call(kernel, grid=(nblk,),
                in_specs=[pl.BlockSpec((BLK // 128, 128), lambda k: (k, 0)),
                          pl.BlockSpec((rows, 128), lambda k: (0, 0))],
                out_specs=pl.BlockSpec((BLK // 128, 128), lambda k: (k, 0)),
                out_shape=jax.ShapeDtypeStruct((nblk * BLK // 128, 128), jnp.float32))
            reps = 40
            @jax.jit
            def rep(ridx, t):
                def body(i, c):
                    return c + f(ridx, t)[0, 0] * jnp.float32(1e-30)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            jax.block_until_ready(rep(ridx, t))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(rep(ridx, t))
                best = min(best, time.perf_counter() - t0)
            per = best / (reps * nblk * BLK) * 1e9
            # exactness
            y = np.asarray(f(ridx, t)[:8])
            exp = np.take_along_axis(np.asarray(t)[0:rows], np.asarray(ridx)[:8].astype(int) % rows, axis=0)[0:8]
            ok = np.array_equal(y, exp)
            print(f"taa0 rows={rows}: {best*1e3:7.1f} ms -> {per:.4f} ns/slot exact={ok}", flush=True)
        except Exception as e:
            print(f"taa0 rows={rows}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

def make_lanemap(win):
    def kernel(st_ref, x_ref, out_ref):
        def body(t, _):
            w = x_ref[pl.ds(0, win)].reshape(win // 128, 128)
            st = st_ref[pl.ds(t * 8, 8), :].astype(jnp.int32)
            lo = st & 127
            A = (st >> 8) & 127     # per-LANE window row
            if win == 1024:
                u = jnp.take_along_axis(w[0:8], A, axis=0)
            else:
                g_of = A >> 3
                u = jnp.zeros((8, 128), jnp.float32)
                for g in range(win // 1024):
                    sub = jnp.take_along_axis(w[g * 8:(g + 1) * 8], A & 7, axis=0)
                    u = jnp.where(g_of == g, sub, u)
            out_ref[pl.ds(t * 8, 8), :] = jnp.take_along_axis(u, lo, axis=1)
            return 0
        jax.lax.fori_loop(0, TPB, body, 0, unroll=True)
    return kernel

def lanemap_bench(win):
    nblk = 256
    rng = np.random.default_rng(1)
    # build a valid stream: random per-lane row map A (8,128) per tile,
    # random per-slot lane lo
    nrows = nblk * BLK // 128
    A = rng.integers(0, win // 128, (nrows, 128)).astype(np.uint16)
    lo = rng.integers(0, 128, (nrows, 128)).astype(np.uint16)
    st = jnp.asarray(lo | (A << 8))
    x = jnp.asarray(rng.random(win), jnp.float32)
    f = pl.pallas_call(make_lanemap(win), grid=(nblk,),
        in_specs=[pl.BlockSpec((BLK // 128, 128), lambda k: (k, 0)),
                  pl.BlockSpec((win,), lambda k: (0,))],
        out_specs=pl.BlockSpec((BLK // 128, 128), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.float32))
    # exactness on first tile rows
    y = np.asarray(f(st, x)[:8])
    xn = np.asarray(x)
    i = np.arange(8)[:, None]
    exp = xn[(A[:8][i, lo[:8].astype(int)].astype(int) * 128 + lo[:8].astype(int))]
    ok = np.array_equal(y, exp)
    reps = 40
    @jax.jit
    def rep(st, x):
        def body(i, c):
            return c + f(st, x)[0, 0] * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    jax.block_until_ready(rep(st, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(rep(st, x))
        best = min(best, time.perf_counter() - t0)
    per = best / (reps * nblk * BLK) * 1e9
    print(f"lanemap win={win}: {best*1e3:7.1f} ms -> {per:.4f} ns/slot exact={ok}", flush=True)

if __name__ == "__main__":
    from graph_tpu import enable_compile_cache
    enable_compile_cache()
    depth_probe()
    for win in (1024, 2048, 8192, 16384):
        lanemap_bench(win)
