"""Prototype: hub-pair placement yield on real scale-22 RMAT data.

Pairs same-(mid, dst) hub edges (internal src < HUB after the degree
relabel) and greedily places them into tiles under the two-stream
lanemap constraint: per (VREG row, lane, stream) one window row.  A
pool of open tiles gives each pair many candidate rows; tiles close
when full or when the pool is saturated with misfits.

Reports, per sampled mid: pair coverage of hub edges, slots saved vs
singles, pad% inside pair tiles, and placement rate (pairs/s) — the
go/no-go for the plan-format integration.

Usage: python scripts/pair_place_proto.py [HUB] [mids...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import cached_rmat

MID = 65536
TILE = 1024


def place_mid(s, d, hub, t_pool=16):
    """Greedy pair placement for one mid's hub edges (s < hub).

    Returns (npairs, nplaced, ntiles, nsingle)."""
    # pair same-dst edges, adjacent in (dst, src) order
    o = np.lexsort((s, d))
    s, d = s[o], d[o]
    # positions within each dst group
    grp_start = np.concatenate([[True], d[1:] != d[:-1]])
    gid = np.cumsum(grp_start) - 1
    first = np.zeros(gid[-1] + 1 if gid.size else 0, np.int64)
    np.add.at(first, gid, 1)
    starts = np.concatenate([[0], np.cumsum(first)])
    pos = np.arange(s.size) - starts[gid]
    is_a = (pos % 2 == 0)
    # an 'a' with a following 'b' in the same group forms a pair
    has_b = np.zeros(s.size, bool)
    has_b[:-1] = is_a[:-1] & (gid[:-1] == (gid[1:] if s.size > 1 else gid[:-1]))
    if s.size > 1:
        has_b[:-1] = is_a[:-1] & (gid[:-1] == gid[1:])
    pa = np.nonzero(has_b)[0]
    s1, s2 = s[pa], s[pa + 1]
    nsingle = s.size - 2 * pa.size
    l1, h1 = (s1 & 127).astype(np.int32), (s1 >> 7).astype(np.int32)
    l2, h2 = (s2 & 127).astype(np.int32), (s2 >> 7).astype(np.int32)

    open_tiles = []  # each: (t1 (8,128) int16, t2, rowfill (8,))
    closed = 0
    placed = 0

    def new_tile():
        return (np.full((8, 128), -1, np.int16),
                np.full((8, 128), -1, np.int16),
                np.zeros(8, np.int32))

    t0 = time.perf_counter()
    for i in range(pa.size):
        a1, b1, a2, b2 = l1[i], h1[i], l2[i], h2[i]
        done = False
        for tile in open_tiles:
            t1, t2, fill = tile
            for r in range(8):
                if fill[r] >= 128:
                    continue
                e1, e2 = t1[r, a1], t2[r, a2]
                if (e1 < 0 or e1 == b1) and (e2 < 0 or e2 == b2):
                    t1[r, a1] = b1
                    t2[r, a2] = b2
                    fill[r] += 1
                    done = True
                    break
                # swapped stream assignment
                e1s, e2s = t1[r, a2], t2[r, a1]
                if (e1s < 0 or e1s == b2) and (e2s < 0 or e2s == b1):
                    t1[r, a2] = b2
                    t2[r, a1] = b1
                    fill[r] += 1
                    done = True
                    break
            if done:
                break
        if not done:
            if len(open_tiles) >= t_pool:
                # close the fullest tile
                k = max(range(len(open_tiles)),
                        key=lambda j: open_tiles[j][2].sum())
                open_tiles.pop(k)
                closed += 1
            tile = new_tile()
            open_tiles.append(tile)
            tile[0][0, a1] = b1
            tile[1][0, a2] = b2
            tile[2][0] += 1
        placed += 1
    dt = time.perf_counter() - t0
    ntiles = closed + len(open_tiles)
    return pa.size, placed, ntiles, nsingle, dt


def main():
    hub = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    mids = [int(v) for v in sys.argv[2:]] or [0, 17, 40]
    src, dst = cached_rmat(22)
    n = 1 << 22
    deg = np.bincount(src, minlength=n)
    order = np.argsort(-deg, kind="stable")
    perm = np.empty(n, np.int32)
    perm[order] = np.arange(n, dtype=np.int32)
    s = perm[src].astype(np.int64)
    d = perm[dst].astype(np.int64)
    m = s.size
    hub_edges = int((s < hub).sum())
    print(f"scale 22: m={m}, hub(<{hub}) edges={hub_edges} "
          f"({100*hub_edges/m:.1f}%)", flush=True)
    for mi in mids:
        sel = (d // MID == mi) & (s < hub)
        sm, dm = s[sel], d[sel] - mi * MID
        npairs, placed, ntiles, nsingle, dt = place_mid(sm, dm, hub)
        slots = ntiles * TILE
        pad = 100.0 * (slots - npairs) / max(1, slots)
        print(f"mid {mi}: hub_edges={sm.size} pairs={npairs} "
              f"singles={nsingle} tiles={ntiles} pad={pad:.1f}% "
              f"({npairs/max(dt,1e-9)/1e3:.0f}K pairs/s, {dt:.1f}s)",
              flush=True)
        # slots before: sm.size edge slots; after: pairs + singles
        before = sm.size
        after = npairs * (1 + pad / 100.0) + nsingle
        print(f"  hub slot ratio: {after/before:.3f} "
              f"(ideal {.5 + .5*nsingle/before:.3f})", flush=True)


if __name__ == "__main__":
    main()
