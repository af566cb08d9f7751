"""Hub-pair slot compression (plan v10).

Degree-relabeled power-law graphs concentrate most edges at hub sources
(scale-22 RMAT: 54.2% of edges originate from internal src < 32768).
Two same-destination hub edges share one slot: K1 gathers both sources
through independent lanemap streams (kernels mode="pair") and emits
their sum/min, so K2 — ~60% of the spmv budget — routes and scans ~27%
fewer slots.  The combine is associative and commutative in the K2
accumulator domain (int32 wraparound add / min), so results stay
bit-exact.

This module pairs the edges and solves the placement problem: per
(VREG row, window lane, stream) a tile carries ONE row-table entry, so
two pairs may share a row only if their same-lane sources agree on the
table row.  A pool of open tiles (the slot order within a mid is free —
K2's route absorbs it) gives each pair tile_pool*8 candidate rows times
two stream assignments; measured on scale-22 this packs the dominant
mid with ~0% pad (scripts/pair_place_proto.py).

The reference has no analog — it visits every edge individually
(crates/algos/src/page_rank.rs:143-146); pairing is a plan-time
transform unlocked by resolving all conflicts at build time.
"""

from __future__ import annotations

import numpy as np

from graph_tpu.engine.kernels import BLK, MID, SEC, TILE, TPB

#: Internal source ids below HUB are pairing candidates.  65536 is the
#: uint16-encoding ceiling (9-bit row tables, widx bits 7..15) and the
#: measured round-5 default: with SORTED placement most compressed
#: blocks class far below the hub window anyway, so widening the hub
#: is nearly free while covering more edges (scale 22: 8.27 -> 8.50
#: GTEPS; scale 24, where hub-32768 covers only 37% of edges: 5.14 ->
#: 5.33).  $GRAPH_TPU_HUB overrides per process (clamped to 65536).
HUB = 65536


def effective_hub() -> int:
    """HUB with the $GRAPH_TPU_HUB override (clamped to [1024, 65536])."""
    import os

    v = os.environ.get("GRAPH_TPU_HUB")
    if not v:
        return HUB
    return max(1024, min(65536, int(v)))


#: Skip pairing for mids with fewer pairs than this (the pair region
#: pads to whole sections; tiny mids would pad more than they save).
MIN_PAIRS = 2 * BLK
#: Same break-even for quad regions (in quads).
MIN_QUADS = 2 * BLK
#: Open-tile pool size for the greedy placement.
TILE_POOL = 16
#: Cyclic stream-rotation candidates tried per quad placement (4 covers
#: ~100% of scale-22 quads with 3.9% tile pad,
#: scripts/quad_place_proto.py).
QUAD_PERMS = 4


def split_pairs(src, dst, n):
    """Partition edges into hub pairs and rest.

    Returns (s1, s2, d) int64 arrays of paired edges (both sources <
    HUB, equal destination, mid with >= MIN_PAIRS pairs) and
    (rest_src, rest_dst) covering every other edge exactly once.
    """
    hub = min(effective_hub(), n)
    hub_mask = src < hub
    hs, hd = src[hub_mask], dst[hub_mask]
    o = np.lexsort((hs, hd))
    hs, hd = hs[o], hd[o]
    run_start = np.ones(hs.size, bool)
    if hs.size > 1:
        run_start[1:] = hd[1:] != hd[:-1]
    gid = np.cumsum(run_start) - 1
    cnt = np.bincount(gid) if hs.size else np.zeros(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    pos = np.arange(hs.size, dtype=np.int64) - starts[gid]
    paired = (pos | 1) < cnt[gid]
    # drop mids whose pair count is below the section-pad break-even
    mid = hd // MID
    pair_mid = mid[paired & (pos % 2 == 0)]
    per_mid = np.bincount(pair_mid) if pair_mid.size else np.zeros(0)
    ok_mid = np.zeros(int(mid.max()) + 1 if mid.size else 0, bool)
    ok_mid[: per_mid.size] = per_mid >= MIN_PAIRS
    paired &= ok_mid[mid]
    a = paired & (pos % 2 == 0)
    b = paired & (pos % 2 == 1)
    s1, s2, d = hs[a], hs[b], hd[a]
    rest_src = np.concatenate([src[~hub_mask], hs[~paired]])
    rest_dst = np.concatenate([dst[~hub_mask], hd[~paired]])
    return s1, s2, d, rest_src, rest_dst


def split_quads(src, dst, n):
    """Partition edges into hub QUADS and rest (round 5).

    Four same-destination hub edges share one slot (kernels
    mode="quad").  Returns (q, d, rest_src, rest_dst): q is a (4, nq)
    int64 array of quad sources, d their common destinations; rest
    covers every other edge exactly once (feed it to
    :func:`split_pairs` to pair the leftovers).
    """
    hub = min(effective_hub(), n)
    hub_mask = src < hub
    hs, hd = src[hub_mask], dst[hub_mask]
    o = np.lexsort((hs, hd))
    hs, hd = hs[o], hd[o]
    run_start = np.ones(hs.size, bool)
    if hs.size > 1:
        run_start[1:] = hd[1:] != hd[:-1]
    gid = np.cumsum(run_start) - 1
    cnt = np.bincount(gid) if hs.size else np.zeros(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    pos = np.arange(hs.size, dtype=np.int64) - starts[gid]
    quaded = (pos | 3) < cnt[gid]
    mid = hd // MID
    q_mid = mid[quaded & (pos % 4 == 0)]
    per_mid = np.bincount(q_mid) if q_mid.size else np.zeros(0)
    ok_mid = np.zeros(int(mid.max()) + 1 if mid.size else 0, bool)
    ok_mid[: per_mid.size] = per_mid >= MIN_QUADS
    quaded &= ok_mid[mid]
    qsel = [quaded & (pos % 4 == k) for k in range(4)]
    q = np.stack([hs[s] for s in qsel])
    d = hd[qsel[0]]
    rest_src = np.concatenate([src[~hub_mask], hs[~quaded]])
    rest_dst = np.concatenate([dst[~hub_mask], hd[~quaded]])
    return q, d, rest_src, rest_dst


def place_mid_quads(q, dstl, tile_pool=TILE_POOL, nperm=QUAD_PERMS):
    """Greedy four-stream placement of one mid's quads into tiles.

    q: (4, nq) sources; returns (widx (ntiles*8, 128) x4 tuple, keys).
    Stream assignment tries ``nperm`` cyclic rotations of the given
    source order per (tile, row).  Pure-python reference; the C++ port
    (gt_quad_place, native/quad_place.cpp) mirrors it bit for bit.
    """
    nq = q.shape[1]
    lanes = (q & 127).astype(np.int32)
    rows = (q >> 7).astype(np.int32)
    tiles = []
    open_idx = []

    def new_tile():
        t = {
            "tab": np.full((4, 8, 128), -1, np.int16),
            "fill": np.zeros(8, np.int32),
            "lane": [[[] for _ in range(8)] for _ in range(4)],
            "key": [[] for _ in range(8)],
        }
        t["fill"][0] = 1  # (0, 0) reserved for the section-lead pad
        tiles.append(t)
        open_idx.append(len(tiles) - 1)
        return t

    perms = [np.roll(np.arange(4), -r) for r in range(nperm)]
    for i in range(nq):
        ls, hs = lanes[:, i], rows[:, i]
        placed = False
        for ti in open_idx:
            t = tiles[ti]
            tab, fill = t["tab"], t["fill"]
            for r in range(8):
                if fill[r] >= 128:
                    continue
                for p in perms:
                    ok = True
                    for k in range(4):
                        e = tab[k, r, ls[p[k]]]
                        if e >= 0 and e != hs[p[k]]:
                            ok = False
                            break
                    if ok:
                        for k in range(4):
                            tab[k, r, ls[p[k]]] = hs[p[k]]
                            t["lane"][k][r].append(int(ls[p[k]]))
                        t["key"][r].append(int(dstl[i]))
                        fill[r] += 1
                        placed = True
                        break
                if placed:
                    break
            if placed:
                break
        if not placed:
            if len(open_idx) >= tile_pool:
                j = max(open_idx, key=lambda x: int(tiles[x]["fill"].sum()))
                open_idx.remove(j)
            t = new_tile()
            for k in range(4):
                t["tab"][k, 0, ls[k]] = hs[k]
                t["lane"][k][0].append(int(ls[k]))
            t["key"][0].append(int(dstl[i]))
            t["fill"][0] += 1

    ntiles = len(tiles)
    ws = [np.zeros((ntiles * 8, 128), np.uint16) for _ in range(4)]
    keys = np.full(ntiles * TILE, MID, np.int32)
    for t_i, t in enumerate(tiles):
        for r in range(8):
            base = 1 if r == 0 else 0
            k_r = len(t["key"][r])
            for kk in range(4):
                tabk = np.maximum(t["tab"][kk, r], 0).astype(np.uint16)
                row = (tabk << 7).copy()
                if k_r:
                    row[base:base + k_r] |= np.asarray(
                        t["lane"][kk][r], np.uint16)
                ws[kk][t_i * 8 + r] = row
            if k_r:
                keys[t_i * TILE + r * 128 + base:
                     t_i * TILE + r * 128 + base + k_r] = t["key"][r]
    return ws[0], ws[1], ws[2], ws[3], keys


def quad_mid_layout(q, dstl, native=True):
    """Place one mid's quads and pad the region to whole sections.

    Returns (w1, w2, w3, w4, keys, nblocks); same section/lead
    conventions as :func:`pair_mid_layout`.

    Quads are placed in ascending max-table-row order: the slot order
    within a mid is free (K2's routes absorb it), and grouping
    small-row quads into the same tiles lets those K1 blocks class at
    windows far below the 32768 hub cap (the engine's per-block window
    classes, engine._k1_classes) instead of every block paying the
    32-group window loop.
    """
    if q.shape[1]:
        o = np.argsort(q.max(axis=0) >> 7, kind="stable")
        q, dstl = q[:, o], dstl[o]
    res = None
    if q.shape[1] and native:
        from graph_tpu.engine.native_route import quad_place_native

        res = quad_place_native(q, dstl, tile_pool=TILE_POOL,
                                nperm=QUAD_PERMS)
    if res is not None:
        w1, w2, w3, w4, keys = res
    elif q.shape[1]:
        w1, w2, w3, w4, keys = place_mid_quads(q, dstl)
    else:
        z = np.zeros((0, 128), np.uint16)
        w1 = w2 = w3 = w4 = z
        keys = np.zeros(0, np.int32)
    ntiles = w1.shape[0] // 8
    sec_tiles = SEC // TILE
    total = -(-max(ntiles, 1) // sec_tiles) * sec_tiles
    pad_t = total - ntiles
    if pad_t:
        pw = np.zeros((pad_t * 8, 128), np.uint16)
        w1, w2, w3, w4 = (np.concatenate([a, pw])
                          for a in (w1, w2, w3, w4))
        keys = np.concatenate([keys, np.full(pad_t * TILE, MID, np.int32)])
    for t in range(0, total, sec_tiles):
        keys[t * TILE] = -1
    return w1, w2, w3, w4, keys, total // TPB


def place_mid_pairs(s1, s2, dstl, tile_pool=TILE_POOL):
    """Greedy two-stream placement of one mid's pairs into tiles.

    Returns (widx, widx2, keys): widx/widx2 are (ntiles*8, 128) uint16
    lanemap streams (slot window lane in bits 0..6, per-lane row table
    in bits 7..14), keys the (ntiles*TILE,) int32 slot destinations
    (MID marks pads; position (0, 0) of every tile is reserved — the
    caller re-keys section-boundary leads to -1).

    Pure-python reference implementation; the native C++ port
    (gt_pair_place) mirrors it bit-for-bit.
    """
    npairs = s1.size
    l1 = (s1 & 127).astype(np.int32)
    h1 = (s1 >> 7).astype(np.int32)
    l2 = (s2 & 127).astype(np.int32)
    h2 = (s2 >> 7).astype(np.int32)

    tiles = []        # closed + open: dicts
    open_idx = []     # indices into tiles

    def new_tile():
        t = {
            "t1": np.full((8, 128), -1, np.int16),
            "t2": np.full((8, 128), -1, np.int16),
            "fill": np.zeros(8, np.int32),
            "lane1": [[] for _ in range(8)],  # per row: slot lane-1 vals
            "lane2": [[] for _ in range(8)],
            "key": [[] for _ in range(8)],
        }
        t["fill"][0] = 1  # (0, 0) reserved for the section-lead pad
        tiles.append(t)
        open_idx.append(len(tiles) - 1)
        return t

    for i in range(npairs):
        a1, b1, a2, b2 = l1[i], h1[i], l2[i], h2[i]
        placed = False
        for ti in open_idx:
            t = tiles[ti]
            t1, t2, fill = t["t1"], t["t2"], t["fill"]
            for r in range(8):
                if fill[r] >= 128:
                    continue
                e1, e2 = t1[r, a1], t2[r, a2]
                if (e1 < 0 or e1 == b1) and (e2 < 0 or e2 == b2):
                    t1[r, a1] = b1
                    t2[r, a2] = b2
                    t["lane1"][r].append(a1)
                    t["lane2"][r].append(a2)
                    t["key"][r].append(dstl[i])
                    fill[r] += 1
                    placed = True
                    break
                e1, e2 = t1[r, a2], t2[r, a1]
                if (e1 < 0 or e1 == b2) and (e2 < 0 or e2 == b1):
                    t1[r, a2] = b2
                    t2[r, a1] = b1
                    t["lane1"][r].append(a2)
                    t["lane2"][r].append(a1)
                    t["key"][r].append(dstl[i])
                    fill[r] += 1
                    placed = True
                    break
            if placed:
                break
        if not placed:
            if len(open_idx) >= tile_pool:
                k = max(open_idx, key=lambda j: int(tiles[j]["fill"].sum()))
                open_idx.remove(k)
            t = new_tile()
            t["t1"][0, a1] = b1
            t["t2"][0, a2] = b2
            t["lane1"][0].append(a1)
            t["lane2"][0].append(a2)
            t["key"][0].append(dstl[i])
            t["fill"][0] += 1

    return encode_tiles(tiles)


def encode_tiles(tiles):
    """Encode placed tiles into (widx, widx2, keys) arrays."""
    ntiles = len(tiles)
    widx = np.zeros((ntiles * 8, 128), np.uint16)
    widx2 = np.zeros((ntiles * 8, 128), np.uint16)
    keys = np.full(ntiles * TILE, MID, np.int32)
    for t_i, t in enumerate(tiles):
        for r in range(8):
            base = 1 if r == 0 else 0  # (0,0) reserved pad slot
            lanes1 = t["lane1"][r]
            k = len(lanes1)
            tab1 = np.maximum(t["t1"][r], 0).astype(np.uint16)
            tab2 = np.maximum(t["t2"][r], 0).astype(np.uint16)
            row1 = (tab1 << 7).copy()
            row2 = (tab2 << 7).copy()
            if k:
                sl = slice(base, base + k)
                row1[sl] |= np.asarray(lanes1, np.uint16)
                row2[sl] |= np.asarray(t["lane2"][r], np.uint16)
                keys[t_i * TILE + r * 128 + base:
                     t_i * TILE + r * 128 + base + k] = t["key"][r]
            widx[t_i * 8 + r] = row1
            widx2[t_i * 8 + r] = row2
    return widx, widx2, keys


def pair_mid_layout(s1, s2, dstl, sec_phase=0, native=True):
    """Place one mid's pairs and pad the region to whole sections.

    ``sec_phase``: tile offset of the region start within its section
    (the pair region is appended after the mid's regular slots, which
    are already section-padded, so this is 0).  Returns (widx, widx2,
    keys, nblocks): the region spans nblocks K1 blocks, a multiple of
    SEC // BLK.  ``native=False`` forces the pure-python placement
    (tests compare the two bit-for-bit).

    Pairs are placed in ascending max-table-row order (see
    :func:`quad_mid_layout`) so small-row pair blocks class below the
    32768 hub window.
    """
    if s1.size:
        o = np.argsort(np.maximum(s1, s2) >> 7, kind="stable")
        s1, s2, dstl = s1[o], s2[o], dstl[o]
    res = None
    if s1.size and native:
        from graph_tpu.engine.native_route import pair_place_native

        res = pair_place_native(s1, s2, dstl, tile_pool=TILE_POOL)
    if res is not None:
        widx, widx2, keys = res
    else:
        widx, widx2, keys = (place_mid_pairs(s1, s2, dstl)
                             if s1.size else
                             (np.zeros((0, 128), np.uint16),
                              np.zeros((0, 128), np.uint16),
                              np.zeros(0, np.int32)))
    ntiles = widx.shape[0] // 8
    sec_tiles = SEC // TILE
    total = -(-max(ntiles, 1) // sec_tiles) * sec_tiles
    pad_t = total - ntiles
    if pad_t:
        pw = np.zeros((pad_t * 8, 128), np.uint16)
        widx = np.concatenate([widx, pw])
        widx2 = np.concatenate([widx2, pw])
        keys = np.concatenate(
            [keys, np.full(pad_t * TILE, MID, np.int32)])
    # section-boundary leads: slot 0 of tiles at whole-section offsets
    for t in range(0, total, sec_tiles):
        keys[t * TILE] = -1
    return widx, widx2, keys, total // TPB
