"""Stage attribution for the EdgeEngine spmv on the real TPU.

Usage: python scripts/perf_attr.py [scale] [win] [nslices]

Times, floor-proofed (hundreds of in-jit chained repetitions, see
PERF_NOTES.md "Measurement discipline"):
* full spmv (K1 + K2),
* K1 alone (all window classes, chained),
* K2 alone,
and prints the plan's layout stats (win, pad, window-class mix) so the
ns/edge numbers can be attributed to scan rows vs routing vs IO.
RMAT edges and plans are cached under ~/.cache/graph_tpu.
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
from graph_tpu.engine.kernels import TPB, k2_reduce  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402


def timed_loop(fn, *args, label="", per=1.0):
    r = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda a: np.asarray(a.reshape(-1)[0:1]), r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms -> {best/per*1e9:.4f} ns/unit",
          flush=True)
    return best / per


def main():
    # args: scale [win] [nslices] [relabel: none|degree]
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    win = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    win = win or None
    nslices = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    nslices = nslices or None
    relabel = sys.argv[4] if len(sys.argv) > 4 else None
    relabel = None if relabel in (None, "none") else relabel
    src, dst = cached_rmat(scale)
    n = 1 << scale
    m = src.size
    t0 = time.perf_counter()
    plan = load_or_build_plan(src, dst, n, cache_dir=f"{CACHE}/plans",
                              win=win, nslices=nslices, relabel=relabel)
    print(f"plan: {time.perf_counter()-t0:.0f}s  win={plan.win} "
          f"nslices={plan.nslices} nslots={plan.nslots} "
          f"pad={100*(plan.nslots-m)/plan.nslots:.1f}% "
          f"nsec={plan.nsec} nmid={plan.nmid}", flush=True)
    eng = EdgeEngine(plan)
    nblocks = plan.sb.shape[0]
    rows_weighted = 0.0
    for w, mo, bc in _k1_classes(plan):
        print(f"  class win={w} {mo}: {bc.size} blocks "
              f"({100*bc.size/max(nblocks,1):.1f}%)")
        rows_weighted += (w // 128) * bc.size
    print(f"  weighted avg scan rows/block: {rows_weighted/max(nblocks,1):.1f}")

    # Floor-proofing (PERF_NOTES "Measurement discipline"): the tunnel
    # adds ~30 ms per dispatch, so each timed loop must run >= ~400 ms
    # of device work or the floor inflates ns/edge by up to ~25%.
    # Target ~2G slot-visits per loop (~400 ms at 0.2 ns/edge).
    reps = max(32, int(2e9 // m))
    print(f"reps={reps}")
    dev = eng.dev
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.random(n) * 1e-5).astype(np.float32))

    @jax.jit
    def spmv_loop(dev, x):
        def body(i, x):
            # internal: time the kernels, not the once-per-run permutes
            return eng.spmv_dev(dev, x, internal=True) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, reps, body, x)

    t_spmv = timed_loop(spmv_loop, dev, x, label="spmv", per=reps * m)

    xp = jnp.zeros(plan.nx, jnp.float32).at[:n].set(x)

    @jax.jit
    def k1_loop(dev, xp):
        def body(i, xp):
            c = eng._k1(dev, xp)
            return xp + c[0, 0] * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, reps, body, xp)

    t_k1 = timed_loop(k1_loop, dev, xp, label="k1", per=reps * m)

    if plan.nslices > 1:
        # A/B the modular x-slice streams (GRAPH_TPU_K1_MODXS, read at
        # trace time) against the legacy all-restage staging
        os.environ["GRAPH_TPU_K1_MODXS"] = "0"
        try:
            @jax.jit
            def k1_legacy_loop(dev, xp):
                def body(i, xp):
                    c = eng._k1(dev, xp)
                    return xp + c[0, 0] * jnp.float32(1e-30)
                return jax.lax.fori_loop(0, reps, body, xp)

            timed_loop(k1_legacy_loop, dev, xp, label="k1[modxs=0]",
                       per=reps * m)
        finally:
            os.environ.pop("GRAPH_TPU_K1_MODXS", None)

    contrib0 = eng._k1(dev, xp)

    @jax.jit
    def k2_loop(dev, contrib):
        def body(i, contrib):
            y = k2_reduce(contrib, dev["wa"], dev["wb"], dev["sstart"],
                          dev["wa2"], dev["wb2"], dev["sec_mid"],
                          plan.nmid, op="sum")
            return contrib + y[0, 0].astype(jnp.float32) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, reps, body, contrib)

    t_k2 = timed_loop(k2_loop, dev, contrib0, label="k2", per=reps * m)
    s, k1, k2 = t_spmv * 1e9, t_k1 * 1e9, t_k2 * 1e9
    print(f"summary scale={scale}: spmv {s:.4f} = k1 {k1:.4f} + "
          f"k2 {k2:.4f} (+overlap {s-k1-k2:+.4f}) ns/edge; "
          f"{1e-9/t_spmv:.2f} GTEPS", flush=True)


if __name__ == "__main__":
    main()
