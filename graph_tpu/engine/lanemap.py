"""Lanemap tile packing — the placement pass behind K1 mode="lanemap".

Composition fact (measured on v5e, scripts/perf_k1_lanemap.py): Mosaic
lowers an 8-deep sublane gather natively, and chaining
``taa(axis=0)`` then ``taa(axis=1)`` computes

    out[i, j] = w[A[i, lo[i, j]], lo[i, j]]

i.e. the row index is evaluated at the FINAL lane.  So a per-slot
(row, lane) index pair canNOT be gathered in two ops — but a per-(VREG
row, window lane) row TABLE can: if every slot placed in VREG row ``i``
with window lane ``l`` shares one window row ``A[i, l]``, the tile's
whole gather is 2 VREG ops per 8-row window group plus one final lane
taa, independent of how slots are packed otherwise.  That constraint is
far weaker than the row-matched placement (kernels mode="rowmatch"):
duplicates of one hub source share (lane, row) and are free; only >8
DISTINCT window rows on one lane within a tile, or row-capacity
conflicts, force a fallback.

This pass permutes slots WITHIN each 1024-slot tile (slot order within
a tile is free — K2's build-time Benes route absorbs any intra-section
permutation) and re-encodes widx as

    bits 0..6   slot's window lane (lo), per physical slot
    bits 7..14  row table A for this physical position's LANE, per
                (VREG row, physical lane) — note the two fields describe
                DIFFERENT things sharing one uint16 stream.  8 table
                bits cover win up to 32768 (256 window rows); win-65536
                plans extend the table to 9 bits using bit 15 (kernels
                pick the decode width from the plan's win)

Blocks where any tile fails keep their original (position) encoding and
class as rowscan/rowmatch; the per-block ``lm`` mask ships in the plan
(EdgePlan.lm) so engine._k1_classes knows which decoding each block
uses.  Replaces nothing in the reference — this is plan-time conflict
resolution the reference's per-edge pull loop
(crates/algos/src/page_rank.rs:143-146) never needs.
"""

from __future__ import annotations

import numpy as np

from graph_tpu.engine.kernels import BLK, MID, TILE

#: Row-table rows per tile (VREG sublanes).
_ROWS = 8
_LANES = 128


def _pack_tile(pos: np.ndarray, real_idx: np.ndarray):
    """Assign one tile's real slots to (row, position).

    pos: (k,) window positions of the real slots (window-local, < win).
    real_idx: (k,) their indices within the tile (original positions).

    Returns (perm_src, perm_dst, table) — original tile positions,
    their new tile positions, and the (8, 128) row table (int16, -1 =
    unused) — or None when the tile does not fit the lanemap
    constraint.
    """
    lo = pos & 127
    hi = pos >> 7
    # group slots by (lane, row); >8 distinct rows on one lane -> fail
    key = lo * 512 + hi  # hi < 512 always (win <= 65536, 9-bit table)
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    g_lo = (uniq // 512).astype(np.int64)
    if np.bincount(g_lo, minlength=_LANES).max() > _ROWS:
        return None
    g_hi = (uniq % 512).astype(np.int64)
    order = np.argsort(-counts, kind="stable")

    cap = np.full(_ROWS, _LANES, np.int64)
    table = np.full((_ROWS, _LANES), -1, np.int16)
    # per group: list of (row, take) spans
    g_rows = [None] * uniq.size
    for gi in order:
        l, h, c = int(g_lo[gi]), int(g_hi[gi]), int(counts[gi])
        spans = []
        # rows whose lane-l table entry is free, fullest-capacity first
        # (greedy big-groups-first keeps small groups feasible)
        cand = np.nonzero(table[:, l] == -1)[0]
        cand = cand[np.argsort(-cap[cand], kind="stable")]
        for r in cand:
            if c == 0:
                break
            if cap[r] == 0:
                continue
            take = min(int(cap[r]), c)
            spans.append((int(r), take))
            table[r, l] = h
            cap[r] -= take
            c -= take
        if c:
            return None
        g_rows[gi] = spans

    # place: slots of each group go to its spans in original order
    perm_src = np.empty(real_idx.size, np.int64)
    perm_dst = np.empty(real_idx.size, np.int64)
    inv_order = np.argsort(inv, kind="stable")
    g_start = np.concatenate([[0], np.cumsum(counts)])
    row_ptr = np.zeros(_ROWS, np.int64)
    out = 0
    for gi in range(uniq.size):
        members = real_idx[inv_order[g_start[gi]:g_start[gi + 1]]]
        at = 0
        for r, take in g_rows[gi]:
            sel = members[at:at + take]
            perm_src[out:out + take] = sel
            perm_dst[out:out + take] = r * _LANES + row_ptr[r] + np.arange(
                take)
            row_ptr[r] += take
            at += take
            out += take
    return perm_src, perm_dst, table


def _pack_tile2(pos: np.ndarray, real_idx: np.ndarray):
    """Two-table variant of :func:`_pack_tile` (round 4).

    Each (VREG row, window lane) can serve TWO window rows — table 1
    lives in widx bits 7..14, table 2 in a separate uint8 stream, and
    each slot's widx bit 15 says which table resolves it.  Eligibility
    doubles: <= 16 distinct window rows per lane, 2 entries per
    (row, lane).  Table-2 entries are 8-bit, so win <= 32768.

    Returns (perm_src, perm_dst, sel, table1, table2) or None.
    """
    lo = pos & 127
    hi = pos >> 7
    key = lo * 512 + hi
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    g_lo = (uniq // 512).astype(np.int64)
    if np.bincount(g_lo, minlength=_LANES).max() > 2 * _ROWS:
        return None
    g_hi = (uniq % 512).astype(np.int64)
    if g_hi.size and g_hi.max() > 255:  # uint8 table-2 stream
        return None
    order = np.argsort(-counts, kind="stable")

    cap = np.full(_ROWS, _LANES, np.int64)
    table = np.full((2, _ROWS, _LANES), -1, np.int16)
    g_rows = [None] * uniq.size  # per group: list of (row, take, tab)
    for gi in order:
        l, h, c = int(g_lo[gi]), int(g_hi[gi]), int(counts[gi])
        spans = []
        free = (table[:, :, l] == -1).any(axis=0)
        cand = np.nonzero(free)[0]
        cand = cand[np.argsort(-cap[cand], kind="stable")]
        for r in cand:
            if c == 0:
                break
            if cap[r] == 0:
                continue
            t = 0 if table[0, r, l] == -1 else 1
            take = min(int(cap[r]), c)
            spans.append((int(r), take, t))
            table[t, r, l] = h
            cap[r] -= take
            c -= take
        if c:
            return None
        g_rows[gi] = spans

    perm_src = np.empty(real_idx.size, np.int64)
    perm_dst = np.empty(real_idx.size, np.int64)
    sel = np.empty(real_idx.size, np.uint16)
    inv_order = np.argsort(inv, kind="stable")
    g_start = np.concatenate([[0], np.cumsum(counts)])
    row_ptr = np.zeros(_ROWS, np.int64)
    out = 0
    for gi in range(uniq.size):
        members = real_idx[inv_order[g_start[gi]:g_start[gi + 1]]]
        at = 0
        for r, take, t in g_rows[gi]:
            selm = members[at:at + take]
            perm_src[out:out + take] = selm
            perm_dst[out:out + take] = r * _LANES + row_ptr[r] + np.arange(
                take)
            sel[out:out + take] = t
            row_ptr[r] += take
            at += take
            out += take
    return perm_src, perm_dst, sel, table[0], table[1]


def lanemap2_pack(widx: np.ndarray, keys: np.ndarray,
                  wvals: "np.ndarray | None", win: int,
                  skip: np.ndarray):
    """Repack remaining blocks with the two-table layout (in place).

    skip: (nblocks,) bool — blocks already lane-mapped by pass 1 (their
    widx no longer holds positions).  Returns (lm2 mask, wt2) where wt2
    is the full (nslots,) uint8 table-2 stream (zeros outside lm2
    blocks), or (zeros, None) when nothing fits.
    """
    nslots = widx.size
    nblocks = nslots // BLK
    if win > 32768:  # table-2 entries are 8 bits
        return np.zeros(nblocks, bool), None
    lm2 = np.zeros(nblocks, bool)
    wt2 = np.zeros(nslots, np.uint8)
    k2 = keys.reshape(-1, TILE)
    w2 = widx.reshape(-1, TILE)
    v2 = None if wvals is None else wvals.reshape(-1, TILE)
    tpb = BLK // TILE
    any_fit = False
    for b in range(nblocks):
        if skip[b]:
            continue
        staged = []
        ok = True
        for t in range(b * tpb, (b + 1) * tpb):
            kt = k2[t]
            real = np.nonzero((kt >= 0) & (kt < MID))[0]
            lead = np.nonzero(kt == -1)[0]
            if real.size == 0:
                staged.append((t, None, lead))
                continue
            res = _pack_tile2(w2[t][real].astype(np.int64), real)
            if res is None:
                ok = False
                break
            staged.append((t, res, lead))
        if not ok:
            continue
        for t, res, lead in staged:
            t1_bits = np.zeros(TILE, np.uint16)
            t2_vals = np.zeros(TILE, np.uint8)
            new_k = np.full(TILE, MID, np.int32)
            new_w = np.zeros(TILE, np.uint16)
            new_v = None if v2 is None else np.zeros(TILE, np.float32)
            used = np.zeros(TILE, bool)
            if res is not None:
                perm_src, perm_dst, sel, table1, table2 = res
                t1_bits = (np.where(table1 < 0, 0, table1)
                           .astype(np.uint16).reshape(-1) << 7)
                t2_vals = (np.where(table2 < 0, 0, table2)
                           .astype(np.uint8).reshape(-1))
                new_w[perm_dst] = ((w2[t][perm_src] & 127).astype(np.uint16)
                                   | (sel << 15))
                new_k[perm_dst] = k2[t][perm_src]
                if new_v is not None:
                    new_v[perm_dst] = v2[t][perm_src]
                used[perm_dst] = True
            if lead.size:
                spot = int(np.nonzero(~used)[0][0])
                new_k[spot] = -1
            w2[t] = new_w | t1_bits
            k2[t] = new_k
            wt2[t * TILE:(t + 1) * TILE] = t2_vals
            if new_v is not None:
                v2[t] = new_v
        lm2[b] = True
        any_fit = True
    return lm2, (wt2 if any_fit else None)


def lanemap_pack(widx: np.ndarray, keys: np.ndarray,
                 wvals: "np.ndarray | None", win: int):
    """Repack every block's tiles into the lanemap layout (in place).

    widx: (nslots,) uint16 window positions; keys: (nslots,) int32
    destination-locals (-1 lead pad, MID tail pad); wvals: optional
    (nslots,) f32.  Mutates the arrays for blocks where all 16 tiles
    fit and returns the per-block success mask (nblocks,) bool.
    """
    nslots = widx.size
    nblocks = nslots // BLK
    # 8-bit table (bits 7..14) for win <= 32768; win-65536 plans use a
    # 9th bit at bit 15 (kernels decode by the plan's win)
    assert win <= 65536, "lanemap row table is 9 bits (win <= 65536)"
    lm = np.zeros(nblocks, bool)
    k2 = keys.reshape(-1, TILE)
    w2 = widx.reshape(-1, TILE)
    v2 = None if wvals is None else wvals.reshape(-1, TILE)
    ntiles = nslots // TILE
    tpb = BLK // TILE
    for b in range(nblocks):
        staged = []
        ok = True
        for t in range(b * tpb, (b + 1) * tpb):
            kt = k2[t]
            real = np.nonzero((kt >= 0) & (kt < MID))[0]
            # the lead pad (key -1) travels with the pads; remember it
            lead = np.nonzero(kt == -1)[0]
            if real.size == 0:
                staged.append((t, None, lead))
                continue
            res = _pack_tile(w2[t][real].astype(np.int64), real)
            if res is None:
                ok = False
                break
            staged.append((t, res, lead))
        if not ok:
            continue
        for t, res, lead in staged:
            hi_bits = np.zeros(TILE, np.uint16)
            new_k = np.full(TILE, MID, np.int32)
            new_w = np.zeros(TILE, np.uint16)
            new_v = None if v2 is None else np.zeros(TILE, np.float32)
            used = np.zeros(TILE, bool)
            if res is not None:
                perm_src, perm_dst, table = res
                hi_bits = (np.where(table < 0, 0, table)
                           .astype(np.uint16).reshape(-1) << 7)
                new_w[perm_dst] = (w2[t][perm_src] & 127).astype(np.uint16)
                new_k[perm_dst] = k2[t][perm_src]
                if new_v is not None:
                    new_v[perm_dst] = v2[t][perm_src]
                used[perm_dst] = True
            if lead.size:  # keep the section's lead pad inside its tile
                spot = int(np.nonzero(~used)[0][0])
                new_k[spot] = -1
            w2[t] = new_w | hi_bits
            k2[t] = new_k
            if new_v is not None:
                v2[t] = new_v
        lm[b] = True
    return lm
