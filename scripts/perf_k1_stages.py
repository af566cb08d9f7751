"""K1 stage attribution on the real plan (class chaining, scan rows).

Usage: python scripts/perf_k1_stages.py [scale] [relabel]

Times, on the cached plan:
  chained   the production _k1 (window classes chained via aliasing)
  perclass  each class alone into a fresh output (no aliasing chain)
  onewin    a single full-window class (plan.win for every block)

If `chained` >> sum(perclass), the input_output_aliases chain is
copying the (nslots, 128) output buffer between class calls.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from graph_tpu import enable_compile_cache

enable_compile_cache()

from bench import BENCH_CACHE as CACHE, cached_rmat  # noqa: E402
from graph_tpu.engine.engine import EdgeEngine, _k1_classes  # noqa: E402
from graph_tpu.engine.kernels import k1_gather  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402


def timed(fn, *args, per=1.0, label=""):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r.reshape(-1)[0:1])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s}: {best*1e3:7.1f} ms -> {best/per*1e9:.4f} ns/edge",
          flush=True)
    return best / per


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    relabel = sys.argv[2] if len(sys.argv) > 2 else "degree"
    relabel = None if relabel == "none" else relabel
    src, dst = cached_rmat(scale)
    n = 1 << scale
    m = src.size
    plan = load_or_build_plan(src, dst, n, cache_dir=f"{CACHE}/plans",
                              relabel=relabel)
    eng = EdgeEngine(plan)
    dev = eng.dev
    rng = np.random.default_rng(1)
    xp = jnp.zeros(plan.nx, jnp.float32).at[:n].set(
        jnp.asarray((rng.random(n) * 1e-5).astype(np.float32)))
    reps = max(8, int(1.2e9 // (m * 8)))
    print(f"classes: {[(w, mo, dev[f'border{w}_{mo}'].shape[0])"
          f" for w, mo in eng.k1_cls]} reps={reps}", flush=True)

    @jax.jit
    def chained(dev, xp):
        def body(i, xp):
            c = eng._k1(dev, xp)
            return xp.at[0].add(c[0, 0] * jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, xp)

    timed(chained, dev, xp, per=reps * m, label="chained (production)")

    for w, mo in eng.k1_cls:
        border = dev[f"border{w}_{mo}"]
        nb = border.shape[0]

        @jax.jit
        def perclass(dev, xp, border=border, w=w, mo=mo):
            def body(i, xp):
                c = k1_gather(xp, dev["widx"], border, dev["sb"], dev["ws"],
                              win=w, nslices=plan.nslices, mode=mo)
                return xp.at[0].add(c[0, 0] * jnp.float32(1e-30))
            return jax.lax.fori_loop(0, reps, body, xp)

        timed(perclass, dev, xp, per=reps * m,
              label=f"class win={w} {mo} ({nb} blocks)")

    @jax.jit
    def onewin(dev, xp):
        def body(i, xp):
            c = k1_gather(xp, dev["widx"], dev["border"], dev["sb"],
                          dev["ws"], win=plan.win, nslices=plan.nslices)
            return xp.at[0].add(c[0, 0] * jnp.float32(1e-30))
        return jax.lax.fori_loop(0, reps, body, xp)

    timed(onewin, dev, xp, per=reps * m, label=f"one win={plan.win}")


if __name__ == "__main__":
    main()
