"""Prototype: hub-QUAD placement yield (4 same-dst hub edges / slot).

Go/no-go numbers for the quad plan format: how many quads place under
the 4-stream lanemap table constraint (per (VREG row, lane, stream)
one window row), with how much tile pad, at what placement speed.
Tries ``nperm`` cyclic rotations of the degree-sorted source order.

Usage: python scripts/quad_place_proto.py [scale] [sample_quads] [nperm]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import cached_rmat

MID = 65536
HUB = 32768
TILE_POOL = 16


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    sample = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    nperm = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    src, dst = cached_rmat(scale)
    n = 1 << scale
    deg = np.bincount(src, minlength=n)
    order = np.argsort(-deg, kind="stable")
    perm = np.empty(n, np.int32)
    perm[order] = np.arange(n, dtype=np.int32)
    src = perm[src]
    dst = perm[dst]
    # densest mid
    mid = dst // MID
    counts = np.bincount(mid)
    mi = int(np.argmax(counts))
    sel = (mid == mi) & (src < HUB)
    s, d = src[sel], dst[sel]
    o = np.lexsort((s, d))
    s, d = s[o], d[o]
    run_start = np.ones(s.size, bool)
    run_start[1:] = d[1:] != d[:-1]
    gid = np.cumsum(run_start) - 1
    cnt = np.bincount(gid)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    pos = np.arange(s.size) - starts[gid]
    quad_ok = (pos | 3) < cnt[gid]
    q_first = quad_ok & (pos % 4 == 0)
    qa = np.nonzero(q_first)[0]
    print(f"mid {mi}: hub edges {s.size}, quadable {4*qa.size} "
          f"({100*4*qa.size/max(1,s.size):.1f}%)")
    qa = qa[:sample]
    Q = np.stack([s[qa + k] for k in range(4)], axis=1)  # (nq, 4) srcs
    lanes = (Q & 127).astype(np.int16)
    rows = (Q >> 7).astype(np.int16)

    tiles = []   # each: (4, 8, 128) int16 tables, fill (8,)
    open_idx = []
    placed = 0
    t0 = time.perf_counter()
    perms = [np.roll(np.arange(4), -r) for r in range(nperm)]
    for i in range(Q.shape[0]):
        ls, hs = lanes[i], rows[i]
        done = False
        for ti in open_idx:
            tabs, fill = tiles[ti]
            for r in range(8):
                if fill[r] >= 128:
                    continue
                for p in perms:
                    ok = True
                    for k in range(4):
                        e = tabs[k, r, ls[p[k]]]
                        if e >= 0 and e != hs[p[k]]:
                            ok = False
                            break
                    if ok:
                        for k in range(4):
                            tabs[k, r, ls[p[k]]] = hs[p[k]]
                        fill[r] += 1
                        placed += 1
                        done = True
                        break
                if done:
                    break
            if done:
                break
        if not done:
            if len(open_idx) >= TILE_POOL:
                k2 = max(open_idx, key=lambda j: int(tiles[j][1].sum()))
                open_idx.remove(k2)
            tabs = np.full((4, 8, 128), -1, np.int16)
            fill = np.zeros(8, np.int32)
            for k in range(4):
                tabs[k, 0, ls[k]] = hs[k]
            fill[0] = 1
            tiles.append((tabs, fill))
            open_idx.append(len(tiles) - 1)
            placed += 1
    dt = time.perf_counter() - t0
    nq = Q.shape[0]
    slots = len(tiles) * 1024
    print(f"placed {placed}/{nq} quads into {len(tiles)} tiles "
          f"(pad {100*(slots-placed)/slots:.1f}%) "
          f"at {nq/dt:.0f} quads/s (python)")
    print(f"slots per edge in quad region: {slots/(4*placed):.3f} "
          f"(ideal 0.25)")


if __name__ == "__main__":
    main()
