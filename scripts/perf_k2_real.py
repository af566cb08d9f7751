"""K2 on the REAL plan: classed scan mode vs plain full depth.

The synthetic A/B (perf_k2_sec128.py) measured the (512,128) kernel at
FULL (7,9) scan depth at 0.0927 ns/slot — while the round-3 real-plan
K2 attribution said 0.1239.  Two differences: the real engine runs the
scalar-predicated CLASS mode (2 extra VMEM scratch blocks + predicated
regions), and the real plan's class mix.  This script times, on the
real cached scale-22 plan: classed (engine default), plain full depth,
and per-class fixed-depth calls, to find where the 0.03 lives.

Usage: python scripts/perf_k2_real.py [scale]
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
from graph_tpu.engine.engine import EdgeEngine  # noqa: E402
from graph_tpu.engine.kernels import SEC_R, k2_reduce  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402


def timed(fn, args, reps_small, reps_big, nslots, label):
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def loop(r_static, c, *a):
        def body(i, c):
            y = fn(c, *a)
            return c.at[0, 0].add(y[0, 0] & 1)
        return jax.lax.fori_loop(0, r_static, body, c)

    def t(r):
        def f(c, *a):
            return loop(r, c, *a)
        c = args[0]
        y = f(c, *args[1:])
        np.asarray(y.reshape(-1)[0:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = f(c, *args[1:])
            np.asarray(y.reshape(-1)[0:1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t(reps_small), t(reps_big)
    per = (t2 - t1) / (reps_big - reps_small) / nslots * 1e9
    print(f"{label:14s}: {per:.4f} ns/slot "
          f"({t1*1e3:.0f}/{t2*1e3:.0f} ms at x{reps_small}/x{reps_big})",
          flush=True)
    return per


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    src, dst = cached_rmat(scale)
    n = 1 << scale
    plan = load_or_build_plan(src, dst, n, cache_dir=f"{CACHE}/plans",
                              relabel="degree")
    eng = EdgeEngine(plan)
    dev = eng.dev
    nslots = plan.nsec * SEC_R * 128
    print(f"nsec={plan.nsec} classes={eng.k2_classes is not None}",
          flush=True)
    if eng.k2_classes:
        for ls, rs, ids in eng.k2_classes:
            print(f"  class ({ls},{rs}): {ids.size} sections", flush=True)
    rng = np.random.default_rng(1)
    contrib = jnp.asarray(rng.integers(
        -1000, 1000, size=(plan.nsec * SEC_R, 128),
        dtype=np.int64).astype(np.int32))
    reps = max(6, int(1.2e9 // nslots))
    meta = [dev["wa"], dev["wb"], dev["sstart"], dev["wa2"], dev["wb2"]]

    def f_classed(c, *a):
        return k2_reduce(c, *a, dev["sec_mid"], plan.nmid, op="sum",
                         sec_cls=dev["k2cls"], levels=eng.k2_levels)

    def f_plain(c, *a):
        return k2_reduce(c, *a, dev["sec_mid"], plan.nmid, op="sum")

    args = [contrib] + meta
    if eng.k2_classes is not None:
        timed(f_classed, args, reps, 4 * reps, nslots, "classed")
    timed(f_plain, args, reps, 4 * reps, nslots, "plain (7,9)")

    # exactness cross-check: classed == plain on real metadata
    if eng.k2_classes is not None:
        y1 = np.asarray(f_classed(*args))
        y2 = np.asarray(f_plain(*args))
        assert (y1 == y2).all(), "classed != plain"
        print("classed == plain (bit-exact)", flush=True)


if __name__ == "__main__":
    main()
