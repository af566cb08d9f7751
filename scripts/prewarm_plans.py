"""Pre-build the bench plan caches (pure host work — no TPU needed).

Plan building is numpy + the C++ layout library; running it ahead of
time means ``bench.py`` / ``BENCH_ALL=1`` only pay the (cached) load at
measurement time.  Usage::

    python scripts/prewarm_plans.py [scale ...]

Defaults to the bench suite set: headline scale-22 (degree-relabeled),
the WCC symmetrized scale-22 plan, and the weighted SSSP scale-19 plan.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# plan building never touches a device; force the CPU backend so an
# accidental jnp call can't hang on a down axon tunnel
import jax

jax.config.update("jax_platforms", "cpu")

from bench import PLAN_CACHE, cached_rmat  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402


def warm(tag, src, dst, n, **kw):
    t0 = time.perf_counter()
    plan = load_or_build_plan(np.asarray(src), np.asarray(dst), n,
                              cache_dir=PLAN_CACHE, **kw)
    m = src.size
    print(f"{tag}: {time.perf_counter()-t0:.0f}s  win={plan.win} "
          f"nslices={plan.nslices} pad={100*(plan.nslots-m)/plan.nslots:.1f}%",
          flush=True)


def main():
    scales = [int(a) for a in sys.argv[1:]] or [22]
    for scale in scales:
        n = 1 << scale
        src, dst = cached_rmat(scale)
        warm(f"headline s{scale} (relabel=degree)", src, dst, n,
             relabel="degree")
        if scale == int(os.environ.get("BENCH_SCALE", "22")):
            warm(f"wcc sym s{scale}", np.concatenate([src, dst]),
                 np.concatenate([dst, src]), n)
    sssp_scale = int(os.environ.get("BENCH_SSSP_SCALE", "19"))
    s_src, s_dst = cached_rmat(sssp_scale, seed=7)
    w = np.random.default_rng(3).random(s_src.size).astype(np.float32) * 4
    warm(f"sssp s{sssp_scale} (weighted)", s_src, s_dst, 1 << sssp_scale,
         values=w)


if __name__ == "__main__":
    main()
