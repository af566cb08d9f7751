"""Global triangle count via device sort-join (round 2 redesign).

Reference analog: ``global_triangle_count``
(crates/algos/src/triangle_count.rs:22-86): node-iterator with forward
direction (``v > u`` break) and sorted-list merge intersection via a
put-back iterator, 64-node chunk claiming.  Requires a DEDUPLICATED
undirected graph; counts each distinct triangle exactly once.

TPU-first redesign — variable-length merges and per-wedge membership
gathers are hostile to the vector unit (XLA's random gather is ~15
ns/element), so the whole count becomes three regular bulk primitives:

1. **Orient**: rank nodes by ascending degree; keep edges low->high
   rank.  Forward degree is then bounded by ~sqrt(m) (arboricity), so
   the wedge count W = sum C(d+, 2) stays ~50x m on power-law graphs
   (204M at Graph500 scale 18) instead of exploding at hubs.
2. **Emit wedges with zero gathers**: forward-adjacency lists are packed
   host-side into per-degree-class chunk matrices (rows padded to caps
   4/8/16/32/64; longer lists split into 64-wide chunks).  All ordered
   pairs within a row are emitted on device as static SLICES
   (``chunk[:, :-s]`` x ``chunk[:, s:]`` over shifts s) and cross-chunk
   pairs as broadcast outer products — no gather instruction anywhere.
3. **Join by sort**: wedge keys and (tagged) edge keys are sorted
   together (``lax.sort`` runs at ~200M elem/s on v5e) and matches are
   counted with one segmented associative scan — a wedge (v, w)
   contributes the number of edges (v, w) in its run.

Work is processed in fixed-size slabs (static shapes, one compile),
partial counts accumulated in host int.  The same machinery runs the
SORTED multiset semantics (below) via cross products G(v) x F(v).

Layout semantics (matches the reference exactly):

* DEDUPLICATED — distinct triangles, each counted once (the CLI
  benchmark path, app/src/triangle_count.rs:8-72).
* SORTED — the reference's merge loop over lists *with duplicates and
  self-loops* counts wedge occurrences: for every occurrence pair
  ``v in N(u), v <= u`` and ``w in N(v), w <= v``, add 1 if
  ``w in N(u)`` (set membership — the put-back iterator parks at the
  first match).  The mate golden (scale-8 -> 227,874,
  crates/mate/tests/triangle_count_test.py:5-9) is this multiset count.
  Implemented as G(v) x F(v) occurrence cross products joined against
  the deduplicated membership keys.
* UNSORTED — rejected (the reference's merge intersection silently
  requires sorted lists).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from graph_tpu.graph.csr import CsrLayout, UndirectedCsrGraph

#: Degree-class caps; lists longer than the last cap split into chunks.
CLASS_CAPS = (4, 8, 16, 32, 64)
#: Sentinel id (sorts after any real id; never matches an edge key).
SENT = 1 << 29
#: Wedge slots per join slab (static sort shape).  2^25 was the round-2
#: ceiling — the old 27-pass scan graph OOMed the remote XLA compiler
#: above 2^26; the cummax join compiles far smaller, so larger slabs
#: are worth probing on hardware (override via GRAPH_TPU_TC_SLAB).
SLAB = int(os.environ.get("GRAPH_TPU_TC_SLAB", 1 << 25))


@dataclasses.dataclass(frozen=True)
class TriangleCountResult:
    """Reference analog: mate's ``TriangleCountResult``
    (crates/mate/src/triangle_count.rs:29-52)."""

    triangles: int
    micros: int


# ---------------------------------------------------------------------------
# device pieces


def _emit_intra(chunk: jax.Array, cap: int):
    """All ordered pairs (i < j) within each row, via static slices."""
    vs = [chunk[:, : cap - s].reshape(-1) for s in range(1, cap)]
    ws = [chunk[:, s:].reshape(-1) for s in range(1, cap)]
    return jnp.concatenate(vs), jnp.concatenate(ws)


def _emit_cross(rows_a: jax.Array, rows_b: jax.Array):
    """Full outer products rows_a[i] x rows_b[i], via broadcasting."""
    r, c = rows_a.shape
    v = jnp.broadcast_to(rows_a[:, :, None], (r, c, rows_b.shape[1]))
    w = jnp.broadcast_to(rows_b[:, None, :], (r, c, rows_b.shape[1]))
    return v.reshape(-1), w.reshape(-1)


def _join_count(v: jax.Array, w: jax.Array, ev: jax.Array, ew: jax.Array):
    """Count wedges (v, w) for which an edge (ev, ew) exists.

    Tag bit in the minor key makes edges sort before same-key wedges.
    A wedge matches iff its key run contains an edge, i.e. iff the most
    recent edge position is at or after the wedge's run start — two
    ``lax.cummax`` running maxima over int32 positions (native XLA
    cumulative ops; the round-2 hand-rolled 27-pass key-masked shift
    scan cost ~13 full-array ops per pass and dominated the join).
    Edge keys need not be unique: any edge in the run satisfies the
    test, so multiplicity does not change the 0/1 membership semantics.
    """
    vv = jnp.concatenate([v, ev])
    ww = jnp.concatenate([w * 2 + 1, ew * 2])
    sv, swt = jax.lax.sort((vv, ww), num_keys=2)
    is_edge = (swt & 1) == 0

    idx = jnp.arange(sv.shape[0], dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones(1, jnp.bool_),
         (sv[1:] != sv[:-1]) | (swt[1:] >> 1 != swt[:-1] >> 1)])
    run_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
    last_edge = jax.lax.cummax(jnp.where(is_edge, idx, -1))
    return jnp.sum((~is_edge) & (last_edge >= run_start))


# ---------------------------------------------------------------------------
# host-side packing


def _pack_chunks(heads: np.ndarray, items: np.ndarray):
    """Pack ragged lists (grouped by ``heads``, already sorted) into
    per-degree-class chunk matrices.

    Returns {cap: (rows, cap) int32 matrix} plus, for lists longer than
    the top cap, the (pairs_a, pairs_b) chunk-row matrices whose outer
    products cover cross-chunk pairs.
    """
    top = CLASS_CAPS[-1]
    n = heads.max() + 1 if heads.size else 0
    deg = np.bincount(heads, minlength=n).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(deg)])
    pos = np.arange(items.size, dtype=np.int64) - starts[heads]

    mats = {}
    prev = 1  # lists of length < 2 have no pairs
    for cap in CLASS_CAPS[:-1]:
        sel = (deg > prev) & (deg <= cap)
        prev = cap
        nodes = np.nonzero(sel)[0]
        if nodes.size == 0:
            continue
        row_of = np.full(n, -1, np.int64)
        row_of[nodes] = np.arange(nodes.size)
        mask = sel[heads]
        mat = np.full((nodes.size, cap), SENT, np.int32)
        mat[row_of[heads[mask]], pos[mask]] = items[mask]
        mats[cap] = mat

    # top class: chunk rows of width `top`, one node spans several rows
    sel = deg > CLASS_CAPS[-2]
    nodes = np.nonzero(sel)[0]
    cross = None
    if nodes.size:
        nchunks = -(-deg[nodes] // top)
        row_start = np.concatenate([[0], np.cumsum(nchunks)])
        row_of = np.full(n, -1, np.int64)
        row_of[nodes] = row_start[:-1]
        mask = sel[heads]
        rows = int(row_start[-1])
        mat = np.full((rows, top), SENT, np.int32)
        p = pos[mask]
        mat[row_of[heads[mask]] + p // top, p % top] = items[mask]
        mats[top] = mat
        # cross-chunk row pairs (a < b) per node — grouped by chunk
        # count so the pair expansion is one broadcast per distinct nc
        # (a python loop per NODE cost ~90 s at scale 20)
        pa, pb = [], []
        for v in np.unique(nchunks):
            if v < 2:
                continue
            r0s = row_start[:-1][nchunks == v]
            ia, ib = np.triu_indices(int(v), k=1)
            pa.append((r0s[:, None] + ia[None, :]).ravel())
            pb.append((r0s[:, None] + ib[None, :]).ravel())
        if pa:
            pa = np.concatenate(pa)
            pb = np.concatenate(pb)
            cross = (mat[pa], mat[pb])
    return mats, cross


@functools.partial(jax.jit, static_argnames=("cap", "rows_per"))
def _group_intra(mat, r0, ev, ew, *, cap, rows_per):
    """Fused emit + join for one row group of a chunk matrix.

    One dispatch per group: the old pipeline pushed per-group emission
    outputs through a host-managed pending list (eager slices +
    concatenates + a separate join call), which cost several ~30 ms
    tunnel dispatches per slab and re-uploaded every matrix slice at
    ~53 MB/s; here the matrix lives on device once and the group is a
    dynamic slice.  Pad rows (all-SENT) emit wedges that never match
    an edge key."""
    sub = jax.lax.dynamic_slice_in_dim(mat, r0, rows_per)
    v, w = _emit_intra(sub, cap)
    return _join_count(v, w, ev, ew)


@functools.partial(jax.jit, static_argnames=("rows_per",))
def _group_cross(A, B, r0, ev, ew, *, rows_per):
    """Fused outer-product emit + join for one row group (see
    :func:`_group_intra`)."""
    v, w = _emit_cross(jax.lax.dynamic_slice_in_dim(A, r0, rows_per),
                       jax.lax.dynamic_slice_in_dim(B, r0, rows_per))
    return _join_count(v, w, ev, ew)


def _pad_edge_keys(ev, ew):
    """Pad edge keys to a 2^20 multiple with a sentinel distinct from
    the wedge pad (so pad wedges never match pad edges) — coarse
    enough that the compile cache reuses join programs across similar
    graphs, fine enough that re-sorted edges carry <= 3% pad."""
    unit = 1 << 20
    me = max(unit, -(-int(ev.size) // unit) * unit)
    ev = np.pad(np.asarray(ev, np.int64), (0, me - ev.size),
                constant_values=SENT + 1)
    ew = np.pad(np.asarray(ew, np.int64), (0, me - ew.size),
                constant_values=SENT + 1)
    return ev.astype(np.int32), ew.astype(np.int32)


def _run_join(mats, cross, ev, ew, cross_full=None):
    """Emit wedges group by group and join against the edge keys.

    ``cross_full`` (multiset path) are (A, B) matrices whose outer
    products are the wedges G(v) x F(v); ``mats``/``cross`` cover the
    intra-list pair semantics (distinct path).

    Each degree class processes ~SLAB wedges per fused emit+join call;
    every matrix uploads once and its last group pads with SENT rows,
    so the whole join is one device dispatch per ~SLAB wedges with no
    host-side repacking.  Per-group counts stay DEVICE scalars until
    the end (a host ``int()`` per group would serialize dispatch k+1
    behind group k and pay the ~30 ms tunnel floor per sync).
    """
    ev, ew = _pad_edge_keys(ev, ew)
    ev_dev = jnp.asarray(ev)
    ew_dev = jnp.asarray(ew)
    counts = []
    for cap, mat in (mats or {}).items():
        # slab-sized row groups keep the per-call sort shape ~SLAB
        pairs = cap * (cap - 1) // 2
        rows_per = max(1, SLAB // max(pairs, 1))
        ngroups = -(-mat.shape[0] // rows_per)
        pad_rows = ngroups * rows_per - mat.shape[0]
        if pad_rows:
            mat = np.pad(mat, ((0, pad_rows), (0, 0)),
                         constant_values=SENT)
        mat_dev = jnp.asarray(mat)
        for g in range(ngroups):
            counts.append(_group_intra(mat_dev, jnp.int32(g * rows_per),
                                       ev_dev, ew_dev, cap=cap,
                                       rows_per=rows_per))
    for pair in (cross, cross_full):
        if pair is None:
            continue
        A, B = pair
        per_row = A.shape[1] * B.shape[1]
        rows_per = max(1, SLAB // max(per_row, 1))
        ngroups = -(-A.shape[0] // rows_per)
        pad_rows = ngroups * rows_per - A.shape[0]
        if pad_rows:
            A = np.pad(A, ((0, pad_rows), (0, 0)), constant_values=SENT)
            B = np.pad(B, ((0, pad_rows), (0, 0)), constant_values=SENT)
        A_dev = jnp.asarray(A)
        B_dev = jnp.asarray(B)
        for g in range(ngroups):
            counts.append(_group_cross(A_dev, B_dev, jnp.int32(g * rows_per),
                                       ev_dev, ew_dev, rows_per=rows_per))
    return sum(int(c) for c in counts)


# ---------------------------------------------------------------------------
# public entry


def global_triangle_count(graph: UndirectedCsrGraph) -> TriangleCountResult:
    """Count triangles of an undirected graph.

    Mirrors ``global_triangle_count(&g) -> u64`` (triangle_count.rs:22);
    see the module docstring for per-layout semantics and the design.

    Runnable example (reference doctest analog, triangle_count.rs:93-130):

    >>> from graph_tpu import CsrLayout, GraphBuilder, global_triangle_count
    >>> g = (GraphBuilder().csr_layout(CsrLayout.DEDUPLICATED)
    ...      .edges([(0, 1), (1, 2), (2, 0), (2, 3)]).build_undirected())
    >>> int(global_triangle_count(g).triangles)
    1
    """
    if graph.layout is CsrLayout.SORTED:
        return _multiset_triangle_count(graph)
    if graph.layout is not CsrLayout.DEDUPLICATED:
        raise ValueError(
            "global_triangle_count requires CsrLayout.SORTED or "
            "CsrLayout.DEDUPLICATED (the reference's merge intersection "
            "assumes sorted neighbor lists)"
        )
    mesh = _default_mesh()
    if mesh is not None:
        from graph_tpu.parallel.tc import triangle_count_sharded

        return triangle_count_sharded(graph, mesh)
    start = time.perf_counter()
    prep = _prepare_distinct(graph)
    if prep is None:
        return TriangleCountResult(
            triangles=0, micros=int((time.perf_counter() - start) * 1e6))
    mats, cross, a, b = prep
    count = _run_join(mats, cross, a, b)
    micros = int((time.perf_counter() - start) * 1e6)
    return TriangleCountResult(triangles=count, micros=micros)


def _default_mesh():
    """The mesh installed via graph_tpu.parallel.use_mesh, if multi-device."""
    from graph_tpu.parallel.mesh import get_default_mesh

    mesh = get_default_mesh()
    if mesh is not None and mesh.devices.size > 1:
        return mesh
    return None


def _prepare_distinct(graph: UndirectedCsrGraph):
    """Host prep for distinct counting: orient + pack.

    Returns (mats, cross, a, b) — the degree-class chunk matrices,
    cross-chunk row pairs and oriented edge keys — or None for an
    empty graph.  Shared by the single-device join (:func:`_run_join`)
    and the wedge-partitioned sharded join (parallel/tc.py)."""
    n = graph.node_count
    srcs = np.asarray(graph.csr.sources).astype(np.int64)
    tgts = np.asarray(graph.csr.targets).astype(np.int64)
    # padded (jit-built) dedup graphs carry a sentinel tail; the real
    # edge count is offsets[-1] (graph/build.py static_shapes)
    m_real = int(np.asarray(graph.csr.offsets[-1]))
    srcs, tgts = srcs[:m_real], tgts[:m_real]
    if n == 0 or srcs.size == 0:
        return None
    if n >= SENT:
        raise ValueError(f"triangle count supports node_count < 2^29, got {n}")

    # ascending-degree rank bounds forward degree by the arboricity;
    # native C++ radix path (rank + forward filter + (a, b) sort) when
    # available — numpy lexsort costs minutes at scale 20+ on this host
    from graph_tpu.native.host_csr import tc_orient_native

    nat = tc_orient_native(srcs.astype(np.int32), tgts.astype(np.int32), n)
    if nat is not None:
        a, b = nat[0].astype(np.int64), nat[1].astype(np.int64)
    else:
        deg = np.bincount(srcs, minlength=n)
        order = np.argsort(deg, kind="stable")
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        a = rank[srcs]
        b = rank[tgts]
        fwd = a < b  # each edge once; self-loops drop (equal rank)
        a, b = a[fwd], b[fwd]
        o = np.lexsort((b, a))
        a, b = a[o], b[o]

    mats, cross = _pack_chunks(a.astype(np.int64), b.astype(np.int32))
    return mats, cross, a, b


def _multiset_triangle_count(graph: UndirectedCsrGraph) -> TriangleCountResult:
    """Reference merge-loop semantics on SORTED lists (see module doc)."""
    mesh = _default_mesh()
    if mesh is not None:
        from graph_tpu.parallel.tc import triangle_count_sharded

        return triangle_count_sharded(graph, mesh)
    start = time.perf_counter()
    prep = _prepare_multiset(graph)
    if prep is None:
        return TriangleCountResult(
            triangles=0, micros=int((time.perf_counter() - start) * 1e6))
    A, B, eu, ev2 = prep
    count = _run_join({}, None, eu, ev2, cross_full=(A, B))
    micros = int((time.perf_counter() - start) * 1e6)
    return TriangleCountResult(triangles=count, micros=micros)


def _prepare_multiset(graph: UndirectedCsrGraph):
    """Host prep for SORTED multiset counting: G(v) x F(v) chunk-row
    matrices + distinct membership keys.

    Returns (A, B, edge_u, edge_w) or None when no wedges exist."""
    n = graph.node_count
    srcs = np.asarray(graph.csr.sources).astype(np.int64)
    tgts = np.asarray(graph.csr.targets).astype(np.int64)
    if n == 0 or srcs.size == 0:
        return None
    if n >= SENT:
        raise ValueError(f"triangle count supports node_count < 2^29, got {n}")

    # occurrence prefixes: F(v) = {w in N(v), w <= v} (with duplicates)
    mask = tgts <= srcs
    u1 = srcs[mask]
    v1 = tgts[mask]
    # wedges = G(v) x F(v) where G(v) = {u occurrences with v in F(u)};
    # both grouped by v, emitted as outer products of 64-wide chunks.
    go = np.argsort(v1, kind="stable")
    g_heads, g_items = v1[go], u1[go].astype(np.int32)  # G lists by v
    f_heads, f_items = u1, v1.astype(np.int32)          # F lists by v (sorted)

    top = CLASS_CAPS[-1]

    def chunk_rows(heads, items):
        degc = np.bincount(heads, minlength=n).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(degc)])
        pos = np.arange(items.size, dtype=np.int64) - starts[heads]
        nchunks = -(-degc // top)
        row_start = np.concatenate([[0], np.cumsum(nchunks)])
        mat = np.full((int(row_start[-1]), top), SENT, np.int32)
        mat[row_start[heads] + pos // top, pos % top] = items
        return mat, nchunks, row_start

    gm, gnc, grs = chunk_rows(g_heads, g_items)
    fm, fnc, frs = chunk_rows(f_heads, f_items)
    # chunk-pair expansion grouped by the (gnc, fnc) shape so each
    # distinct shape is one broadcast (per-node meshgrids cost minutes
    # at scale 20)
    pa, pb = [], []
    both = (gnc > 0) & (fnc > 0)
    shape_key = gnc * (fnc.max() + 1) + fnc
    for key in np.unique(shape_key[both]):
        sel = both & (shape_key == key)
        nodes = np.nonzero(sel)[0]
        gv, fv = int(gnc[nodes[0]]), int(fnc[nodes[0]])
        ia, ib = np.meshgrid(np.arange(gv), np.arange(fv), indexing="ij")
        pa.append((grs[nodes][:, None] + ia.ravel()[None, :]).ravel())
        pb.append((frs[nodes][:, None] + ib.ravel()[None, :]).ravel())
    if not pa:
        return None
    A = gm[np.concatenate(pa)]
    B = fm[np.concatenate(pb)]

    # membership keys: distinct (u, w) adjacency pairs, both directions
    uniq = np.ones(srcs.size, bool)
    if srcs.size > 1:
        uniq[1:] = ~((srcs[1:] == srcs[:-1]) & (tgts[1:] == tgts[:-1]))
    return A, B, srcs[uniq], tgts[uniq]
