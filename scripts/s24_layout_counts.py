"""Scale-24 pad by (win, nslices) — host-only layout counts.

Round-3 left scale-24 at 18.2% pad with (32768, 16); VERDICT round-4
item 2 wants < 8%.  Before touching kernels, measure what wider windows
/ deeper slice budgets buy via the native layout pass alone.

Usage: python scripts/s24_layout_counts.py [scale] [relabel]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import cached_rmat  # noqa: E402
from graph_tpu.engine.native_route import build_layout_native  # noqa: E402

CONFIGS = ((16384, 16), (32768, 16), (32768, 32), (65536, 16),
           (65536, 32), (65536, 64), (131072, 64))


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    relabel = sys.argv[2] if len(sys.argv) > 2 else "degree"
    src, dst = cached_rmat(scale)
    n = 1 << scale
    m = src.size
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    if relabel == "degree":
        deg = np.bincount(src, minlength=n)
        order = np.argsort(-deg, kind="stable")
        perm = np.empty(n, np.int32)
        perm[order] = np.arange(n, dtype=np.int32)
        src = perm[src].astype(np.int64)
        dst = perm[dst].astype(np.int64)
    for win, nsl in CONFIGS:
        t0 = time.perf_counter()
        lay = build_layout_native(src, dst, None, n, win=win, nslices=nsl,
                                  n_src=0)
        if lay is None:
            print("native layout unavailable")
            return
        nslots = lay["nslots"]
        pad = 100.0 * (nslots - m) / nslots
        print(f"win={win:6d} nslices={nsl:2d}: slots={nslots} "
              f"pad={pad:5.1f}%  ({time.perf_counter() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
