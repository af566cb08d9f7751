"""Eligibility analysis for a 2-table lanemap (ROADMAP round-4 1(c)).

For every block the round-3 lanemap pass left in positional (rowscan /
rowmatch) encoding, re-run the per-tile pack with 1 and 2 row-table
entries per (VREG row, window lane) and tally failure reasons:

  rows>8 / rows>16 : some window lane needs more distinct window rows
                     than the table(s) can hold
  capacity         : greedy span placement ran out of row capacity

Usage: python scripts/lanemap2_stats.py [scale] [relabel]
Host-only (loads the cached plan; no TPU needed).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import BENCH_CACHE as CACHE, cached_rmat  # noqa: E402
from graph_tpu.engine.kernels import BLK, MID, TILE  # noqa: E402
from graph_tpu.engine.plan import load_or_build_plan  # noqa: E402

_ROWS, _LANES = 8, 128


def pack_tile_k(pos, ntab):
    """_pack_tile feasibility with `ntab` table entries per (row, lane).

    Returns "ok", "rows", or "cap"."""
    lo = pos & 127
    hi = pos >> 7
    key = lo * 512 + hi
    uniq, counts = np.unique(key, return_counts=True)
    g_lo = (uniq // 512).astype(np.int64)
    if np.bincount(g_lo, minlength=_LANES).max() > _ROWS * ntab:
        return "rows"
    g_hi = (uniq % 512).astype(np.int64)
    order = np.argsort(-counts, kind="stable")
    cap = np.full(_ROWS, _LANES, np.int64)
    # table[t][r][l]
    table = np.full((ntab, _ROWS, _LANES), -1, np.int16)
    for gi in order:
        l, h, c = int(g_lo[gi]), int(g_hi[gi]), int(counts[gi])
        # rows with a free (r, l) entry in ANY table, fullest first
        free = (table[:, :, l] == -1).any(axis=0)
        cand = np.nonzero(free)[0]
        cand = cand[np.argsort(-cap[cand], kind="stable")]
        for r in cand:
            if c == 0:
                break
            if cap[r] == 0:
                continue
            t = int(np.nonzero(table[:, r, l] == -1)[0][0])
            take = min(int(cap[r]), c)
            table[t, r, l] = h
            cap[r] -= take
            c -= take
        if c:
            return "cap"
    return "ok"


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    relabel = sys.argv[2] if len(sys.argv) > 2 else "degree"
    relabel = None if relabel == "none" else relabel
    src, dst = cached_rmat(scale)
    n = 1 << scale
    plan = load_or_build_plan(src, dst, n, cache_dir=f"{CACHE}/plans",
                              relabel=relabel)
    widx = plan.widx.reshape(-1).astype(np.int64)
    nblocks = plan.nslots // BLK
    lm = plan.lm.astype(bool) if plan.lm is not None else np.zeros(
        nblocks, bool)
    print(f"scale {scale} win={plan.win} nslices={plan.nslices} "
          f"blocks={nblocks} lanemapped={lm.sum()} "
          f"({100.0 * lm.sum() / max(nblocks, 1):.1f}%)")

    # reconstruct keys (real vs pad) from widx alone is impossible;
    # rebuild the per-slot key from the plan's K2 sstart? cheaper: use
    # wa bit 15 (input pad flag) mapped back... wa is in SORTED order.
    # Instead: a slot is real iff its tile contributed edges; we can't
    # tell pads apart in positional encoding (pads use _ROWPAT).  Treat
    # every slot as real EXCEPT exact _ROWPAT positions that repeat -
    # conservative: include pads; pads sit at (row*128) positions which
    # lanemap handles as one group per lane-0 column... _ROWPAT is
    # (i//128)*128, i.e. lane 0 of each window row - fine, they form 8
    # groups.  This slightly over-constrains; good enough for stats.
    rows_needed = np.zeros(nblocks, np.int64)
    stat = {}
    two_ok = np.zeros(nblocks, bool)
    sel = np.nonzero(~lm)[0]
    rng = np.random.default_rng(0)
    if sel.size > 600:  # sample for speed
        sel = rng.choice(sel, 600, replace=False)
    for b in sel:
        res1 = res2 = "ok"
        for t in range(b * (BLK // TILE), (b + 1) * (BLK // TILE)):
            pos = widx[t * TILE:(t + 1) * TILE]
            r1 = pack_tile_k(pos, 1)
            if r1 != "ok" and res1 == "ok":
                res1 = r1
            if r1 != "ok":
                r2 = pack_tile_k(pos, 2)
                if r2 != "ok":
                    res2 = r2
                    break
        stat[(res1, res2)] = stat.get((res1, res2), 0) + 1
        two_ok[b] = res2 == "ok"
    tot = sum(stat.values())
    print(f"non-lanemap blocks analyzed: {tot}")
    for k, v in sorted(stat.items(), key=lambda kv: -kv[1]):
        print(f"  1-table={k[0]:5s} 2-table={k[1]:5s}: {v:6d} "
              f"({100.0 * v / tot:.1f}%)")


if __name__ == "__main__":
    main()
