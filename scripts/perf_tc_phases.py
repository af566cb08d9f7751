"""Phase attribution for triangle counting (host prep vs device join).

Usage: python scripts/perf_tc_phases.py [scale]

Times each stage of the DEDUPLICATED sort-join pipeline at the given
RMAT scale: graph build, degree-rank + forward filter + lexsort,
chunk packing, and the slab join (device), so the C++ port targets the
actual hotspots (VERDICT round-2: scale-20 TC is ~80% host prep).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from graph_tpu import enable_compile_cache

enable_compile_cache()

from bench import cached_rmat  # noqa: E402
from graph_tpu.algos import triangle_count as tc  # noqa: E402
from graph_tpu.graph.build import build_undirected_host  # noqa: E402
from graph_tpu.graph.csr import CsrLayout  # noqa: E402


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    src, dst = cached_rmat(scale)
    n = 1 << scale
    t0 = time.perf_counter()
    g = build_undirected_host(src, dst, node_count=n,
                              layout=CsrLayout.DEDUPLICATED)
    srcs = g.csr.sources.astype(np.int64)
    tgts = g.csr.targets.astype(np.int64)
    print(f"host build: {time.perf_counter()-t0:.2f}s "
          f"(m_dedup={srcs.size})", flush=True)

    t0 = time.perf_counter()
    from graph_tpu.native.host_csr import tc_orient_native

    nat = tc_orient_native(srcs.astype(np.int32), tgts.astype(np.int32), n)
    a, b = nat[0].astype(np.int64), nat[1].astype(np.int64)
    print(f"orient (native): {time.perf_counter()-t0:.2f}s "
          f"(m_fwd={a.size})", flush=True)

    t0 = time.perf_counter()
    mats, cross = tc._pack_chunks(a.astype(np.int64), b.astype(np.int32))
    rows = {c: m.shape[0] for c, m in mats.items()}
    print(f"pack_chunks: {time.perf_counter()-t0:.2f}s rows={rows} "
          f"cross={None if cross is None else cross[0].shape}", flush=True)

    t0 = time.perf_counter()
    count = tc._run_join(mats, cross, a, b)
    print(f"join (device incl upload): {time.perf_counter()-t0:.2f}s "
          f"triangles={count}", flush=True)

    t0 = time.perf_counter()
    res = tc.global_triangle_count(g)
    print(f"end-to-end global_triangle_count: {time.perf_counter()-t0:.2f}s "
          f"triangles={res.triangles}", flush=True)


if __name__ == "__main__":
    main()
