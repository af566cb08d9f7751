"""Prototype: hub-OCT placement yield (8 same-dst hub edges / slot).

Usage: python scripts/oct_place_proto.py [scale] [sample] [nperm]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench import cached_rmat

MID = 65536
HUB = 65536
TILE_POOL = int(os.environ.get("POOL", 16))
K = 8

def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    sample = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
    nperm = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    src, dst = cached_rmat(scale)
    n = 1 << scale
    deg = np.bincount(src, minlength=n)
    order = np.argsort(-deg, kind="stable")
    perm = np.empty(n, np.int32)
    perm[order] = np.arange(n, dtype=np.int32)
    src = perm[src]; dst = perm[dst]
    mid = dst // MID
    mi = int(np.argmax(np.bincount(mid)))
    sel = (mid == mi) & (src < HUB)
    s, d = src[sel], dst[sel]
    o = np.lexsort((s, d)); s, d = s[o], d[o]
    rs = np.ones(s.size, bool); rs[1:] = d[1:] != d[:-1]
    gid = np.cumsum(rs) - 1
    cnt = np.bincount(gid)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    pos = np.arange(s.size) - starts[gid]
    ok = (pos | (K - 1)) < cnt[gid]
    qa = np.nonzero(ok & (pos % K == 0))[0]
    print(f"mid {mi}: hub edges {s.size}, octable {K*qa.size} "
          f"({100*K*qa.size/max(1,s.size):.1f}%)")
    qa = qa[:sample]
    Q = np.stack([s[qa + k] for k in range(K)], axis=1)
    lanes = (Q & 127).astype(np.int16)
    rows = (Q >> 7).astype(np.int16)
    tiles = []; open_idx = []
    placed = 0
    t0 = time.perf_counter()
    perms = [np.roll(np.arange(K), -r) for r in range(nperm)]
    for i in range(Q.shape[0]):
        ls, hs = lanes[i], rows[i]
        done = False
        for ti in open_idx:
            tabs, fill = tiles[ti]
            for r in range(8):
                if fill[r] >= 128: continue
                for p in perms:
                    okp = True
                    for k in range(K):
                        e = tabs[k, r, ls[p[k]]]
                        if e >= 0 and e != hs[p[k]]:
                            okp = False; break
                    if okp:
                        for k in range(K):
                            tabs[k, r, ls[p[k]]] = hs[p[k]]
                        fill[r] += 1; placed += 1; done = True
                        break
                if done: break
            if done: break
        if not done:
            if len(open_idx) >= TILE_POOL:
                j = max(open_idx, key=lambda x: int(tiles[x][1].sum()))
                open_idx.remove(j)
            tabs = np.full((K, 8, 128), -1, np.int16)
            fill = np.zeros(8, np.int32)
            for k in range(K):
                tabs[k, 0, ls[k]] = hs[k]
            fill[0] = 1
            tiles.append((tabs, fill)); open_idx.append(len(tiles)-1)
            placed += 1
    dt = time.perf_counter() - t0
    nq = Q.shape[0]; slots = len(tiles)*1024
    print(f"placed {placed}/{nq} octs into {len(tiles)} tiles "
          f"(pad {100*(slots-placed)/slots:.1f}%) at {nq/dt:.0f} octs/s")
    print(f"slots per edge in oct region: {slots/(K*placed):.3f} (ideal 0.125)")

if __name__ == "__main__":
    main()
