"""Build-time Clos routing for in-VMEM permutations.

A K2 section is a (R, 128) tile array in VMEM (R = 512 for 64K-edge
sections).  The only vectorized data-movement primitives Mosaic offers
are `take_along_axis` within 128 lanes (per row) and tiny gathers along
a small leading axis (see PERF_NOTES.md).  Any fixed permutation of the
section is therefore decomposed at build time into five index stages

    A:  lane gather within rows of the (R, 128) layout
    T:  transpose to (128, R) viewed as (128, R1, 128), R1 = R // 128
    B:  lane gather within the last axis
    C:  gather along the middle (R1) axis
    D:  lane gather within the last axis
    T': transpose back to (R, 128)
    E:  lane gather within rows

via the classic 3-stage Clos argument (Slepian-Duguid): stage A routes
every element into the intermediate "column" assigned by a 128-edge-
coloring of the bipartite input-row/output-row transfer multigraph
(Euler-split coloring); the per-column R-permutation (stages B-D) is
the same argument recursed on the (R1, 128) view.

This replaces what the reference does with CAS scatters (e.g.
crates/algos/src/dss.rs:148-150): all conflict resolution happens here,
on the host, once per graph.
"""

from __future__ import annotations

import numpy as np


def euler_split(left: np.ndarray, right: np.ndarray, nl: int, nr: int, d: int) -> np.ndarray:
    """Split a d-regular bipartite multigraph (d even) into two halves.

    Returns half ∈ {0,1} per edge; each node has exactly d/2 edges in
    each half (alternate edges of an Euler partition).
    """
    e_cnt = left.size
    ladj = np.empty((nl, d), np.int64)
    radj = np.empty((nr, d), np.int64)
    lcnt = np.zeros(nl, np.int64)
    rcnt = np.zeros(nr, np.int64)
    for e in range(e_cnt):
        l = left[e]
        r = right[e]
        ladj[l, lcnt[l]] = e
        lcnt[l] += 1
        radj[r, rcnt[r]] = e
        rcnt[r] += 1
    used = np.zeros(e_cnt, bool)
    lptr = np.zeros(nl, np.int64)
    rptr = np.zeros(nr, np.int64)
    half = np.empty(e_cnt, np.int8)
    for e0 in range(e_cnt):
        if used[e0]:
            continue
        e = e0
        h = 0
        while True:
            used[e] = True
            half[e] = h
            h ^= 1
            rn = right[e]
            while rptr[rn] < d and used[radj[rn, rptr[rn]]]:
                rptr[rn] += 1
            if rptr[rn] == d:
                break
            e = radj[rn, rptr[rn]]
            used[e] = True
            half[e] = h
            h ^= 1
            ln = left[e]
            while lptr[ln] < d and used[ladj[ln, lptr[ln]]]:
                lptr[ln] += 1
            if lptr[ln] == d:
                break
            e = ladj[ln, lptr[ln]]
    return half


def edge_color(left: np.ndarray, right: np.ndarray, nl: int, nr: int, d: int) -> np.ndarray:
    """d-edge-color a d-regular bipartite multigraph (d = power of two)."""
    if d == 1:
        return np.zeros(left.size, np.int64)
    half = euler_split(left, right, nl, nr, d)
    colors = np.empty(left.size, np.int64)
    for h in (0, 1):
        m = half == h
        sub = edge_color(left[m], right[m], nl, nr, d // 2)
        colors[m] = sub * 2 + h
    return colors


def _route_small(q_inv: np.ndarray, r1: int):
    """Route a permutation of R = r1*128 as lane/middle/lane stages.

    ``q_inv[s]`` = output position of the element at input position s.
    Returns (B, C, D) each shaped (r1, 128):
        after B: y1[a, b] = y[a, B[a, b]]
        after C: y2[a, b] = y1[C[a, b], b]
        after D: y3[a, b] = y2[a, D[a, b]]
    with y3[t // 128, t % 128] == y[s // 128, s % 128] for t = q_inv[s].
    """
    rr = r1 * 128
    s = np.arange(rr)
    t = q_inv
    g_in, lane_in = s // 128, s % 128
    g_out, lane_out = t // 128, t % 128
    k2 = edge_color(g_in, g_out, r1, r1, 128)
    b_idx = np.empty((r1, 128), np.int32)
    c_idx = np.empty((r1, 128), np.int32)
    d_idx = np.empty((r1, 128), np.int32)
    b_idx[g_in, k2] = lane_in
    c_idx[g_out, k2] = g_in
    d_idx[g_out, lane_out] = k2
    return b_idx, c_idx, d_idx


def clos_route(target: np.ndarray, r: int):
    """Decompose a permutation of N = r*128 into the 5 index stages.

    ``target[i]`` = output flat position of input flat position i (a
    bijection on [0, N)).  Returns dict of index arrays:
      A (r,128), B (128,r1,128), C (128,r1,128), D (128,r1,128), E (r,128)
    such that :func:`clos_apply_reference` maps x.flat[i] to out.flat
    position target[i].
    """
    n = r * 128
    r1 = r // 128
    assert r1 * 128 == r
    i = np.arange(n)
    r_in, c_in = i // 128, i % 128
    r_out, c_out = target // 128, target % 128
    k = edge_color(r_in, r_out, r, r, 128)

    a_idx = np.empty((r, 128), np.int32)
    e_idx = np.empty((r, 128), np.int32)
    a_idx[r_in, k] = c_in
    e_idx[r_out, c_out] = k

    b_idx = np.empty((128, r1, 128), np.int32)
    c_idx = np.empty((128, r1, 128), np.int32)
    d_idx = np.empty((128, r1, 128), np.int32)
    # per intermediate column k: element sits at row r_in, must reach r_out
    for col in range(128):
        m = k == col
        q_inv = np.empty(r, np.int64)
        q_inv[r_in[m]] = r_out[m]
        b_idx[col], c_idx[col], d_idx[col] = _route_small(q_inv, r1)
    return {"A": a_idx, "B": b_idx, "C": c_idx, "D": d_idx, "E": e_idx}


def clos_apply_reference(x: np.ndarray, idx) -> np.ndarray:
    """Numpy reference of the kernel's stage sequence. x: (r, 128)."""
    r = x.shape[0]
    r1 = r // 128
    a, b, c, d, e = idx["A"], idx["B"], idx["C"], idx["D"], idx["E"]
    x1 = np.take_along_axis(x, a, axis=1)
    y = x1.T.reshape(128, r1, 128)
    y1 = np.take_along_axis(y, b, axis=2)
    y2 = np.take_along_axis(y1, c, axis=1)
    y3 = np.take_along_axis(y2, d, axis=2)
    z = y3.reshape(128, r).T.copy()
    return np.take_along_axis(z, e, axis=1)


def pack_routing(idx, pad_mask: np.ndarray | None = None,
                 out_mask: np.ndarray | None = None):
    """Pack stages into two uint16 streams for the kernel.

    wA (r,128):  A | E<<7 | flag<<15     (A read at input layout, E at
                                          output layout; the flag bit is
                                          pad_mask at INPUT layout for
                                          route 1, or out_mask at OUTPUT
                                          layout for route 2 — the kernel
                                          applies it at the matching end)
    wB (128,r1,128): B | C<<7 | D<<9     (requires r1 <= 4)
    """
    r1 = idx["B"].shape[1]
    assert r1 <= 4, "wB packing supports r1 <= 4 (section <= 64K edges)"
    assert pad_mask is None or out_mask is None
    wa = idx["A"].astype(np.uint16) | (idx["E"].astype(np.uint16) << 7)
    if pad_mask is not None:
        wa |= pad_mask.astype(np.uint16) << 15
    if out_mask is not None:
        wa |= out_mask.astype(np.uint16) << 15
    wb = (
        idx["B"].astype(np.uint16)
        | (idx["C"].astype(np.uint16) << 7)
        | (idx["D"].astype(np.uint16) << 9)
    )
    return wa, wb


def ends_to_dst_perm(s_key: np.ndarray, mid: int):
    """Build route 2's permutation for one section.

    s_key: (SEC,) sorted destination keys (-1 lead pad, ``mid`` tail
    pads).  For every destination d present in the section, its segment
    END position e_d must route to output position d (the map is
    injective: ends are distinct).  All other positions fill the
    remaining outputs in order (masked garbage).  Returns
    (target2, present) with target2[p] = output position of sorted
    position p and present: (mid,) bool.
    """
    n = s_key.size
    cnt_le = np.searchsorted(s_key, np.arange(mid), side="right")
    cnt_lt = np.searchsorted(s_key, np.arange(mid), side="left")
    present = cnt_le > cnt_lt
    e_d = cnt_le - 1  # >= 0: the lead pad guarantees a position before d=0
    target2 = np.full(n, -1, np.int64)
    dsts = np.nonzero(present)[0]
    target2[e_d[present]] = dsts
    used_out = np.zeros(n, bool)
    used_out[dsts] = True
    target2[target2 < 0] = np.nonzero(~used_out)[0]
    return target2, present
