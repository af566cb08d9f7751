"""Micro-bench: K1 mode="pair" — two-stream hub-pair gather.

A pair slot carries TWO same-destination hub edges: widx/widx2 each
pack (slot window lane | per-lane 9-bit row table) and the kernel emits
combine(x[p1], x[p2]).  Slot count through K2 halves for paired edges
(PERF_NOTES round-4: 97.4% of scale-22 hub edges pair up), so the
question here is what the second gather stream costs per slot and how
the group loop scales with the window (win/1024 iterations x 4 VREG
ops).  Baseline: the production mode="lanemap" at the same windows.

Usage: python scripts/perf_k1_pair.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_tpu.engine.kernels import SLICE, TILE, TPB, k1_gather

BLK = TILE * TPB


def bench(mode, win, nblk=256, op="add", dtype=np.int32):
    rng = np.random.default_rng(11)
    nrows = nblk * BLK // 128
    nslices = max(1, -(-win // SLICE))
    tmask = win // 128 - 1

    def stream():
        A = rng.integers(0, win // 128, (nrows, 128)).astype(np.uint16)
        lo = rng.integers(0, 128, (nrows, 128)).astype(np.uint16)
        return (lo | (A << 7)), A, lo

    widx, A1, lo1 = stream()
    if dtype == np.int32:
        x = rng.integers(-(1 << 20), 1 << 20, nslices * SLICE).astype(np.int32)
    else:
        x = rng.random(nslices * SLICE).astype(np.float32)
    border = np.arange(nblk, dtype=np.uint16)
    sb = np.zeros(nblk, np.uint16)
    ws = np.zeros(nblk * TPB, np.uint8)
    kw = dict(win=win, nslices=nslices, mode=mode)
    if mode == "pair":
        widx2, A2, lo2 = stream()
        kw.update(widx2=jnp.asarray(widx2), pair_op=op)
    args = (jnp.asarray(x), jnp.asarray(widx), jnp.asarray(border),
            jnp.asarray(sb), jnp.asarray(ws))

    # exactness on the first tile
    y = np.asarray(k1_gather(*args, **kw)[:8])
    i8 = np.arange(8)[:, None]
    p1 = (A1[:8][i8, lo1[:8].astype(int)].astype(np.int64) * 128
          + lo1[:8].astype(int))
    exp = x[p1]
    if mode == "pair":
        p2 = (A2[:8][i8, lo2[:8].astype(int)].astype(np.int64) * 128
              + lo2[:8].astype(int))
        exp = exp + x[p2] if op == "add" else np.minimum(exp, x[p2])
    ok = np.array_equal(y, exp)

    # >= 300 ms of device time per timed call or the ~30 ms tunnel
    # dispatch floor dominates (PERF_NOTES "measurement discipline");
    # the carry must PERTURB the next rep's input or XLA hoists the
    # loop-invariant pallas call and times one execution
    reps = 600

    @jax.jit
    def rep(xa, *a):
        def body(i, c):
            y = k1_gather(xa.at[0].add(c), *a, **kw)
            return c + y[0, 0]
        return jax.lax.fori_loop(
            0, reps, body, jnp.zeros((), xa.dtype))

    jax.block_until_ready(rep(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(rep(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / (reps * nblk * BLK) * 1e9
    print(f"{mode:8s} win={win:6d} ({dtype.__name__}): {best*1e3:7.1f} ms "
          f"-> {per:.4f} ns/slot exact={ok}", flush=True)
    return per


if __name__ == "__main__":
    from graph_tpu import enable_compile_cache

    enable_compile_cache()
    for win in (16384, 32768, 65536):
        bench("lanemap", win)
    for win in (16384, 32768, 65536):
        bench("pair", win)
