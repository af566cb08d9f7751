"""Global triangle count via column-blocked bitmap intersections.

Reference analog: ``global_triangle_count``
(crates/algos/src/triangle_count.rs:22-86): node-iterator with forward
direction (``v > u`` break) and sorted-list merge intersection via a
put-back iterator, 64-node chunk claiming.  Requires a DEDUPLICATED
undirected graph; counts each triangle ``w < v < u`` exactly once.

TPU-first redesign — variable-length sorted-list merges are hostile to
vector units, so the intersection becomes bitset algebra:

* keep only *forward* edges ``(u, v), v < u`` (the reference's ``v > u``
  break, triangle_count.rs:49-51),
* for a block of 4096 target columns, build a bitmap ``B`` where row
  ``u`` holds the forward neighbors of ``u`` inside the block (one
  scatter; out-of-block bits dropped),
* every forward edge contributes ``popcount(B[u] & B[v])`` — all common
  forward neighbors ``w`` are ``< v < u`` by construction, so the count
  is exact with no ordering checks,
* edges are processed sorted by ``v`` so blocks whose columns all exceed
  ``v`` are skipped (``B[v]`` would be empty) — with a degree-descending
  relabel (hubs get small ids) most edges touch only the first blocks,
  the same access-locality win the reference gets from
  ``make_degree_ordered`` (graph_ops.rs:135-174).

Exactness: counts are integers ≤ 2^31 per 512k-edge chunk by
construction; chunk sums are accumulated into a device int32 matrix and
reduced on host in int64 — no floating point anywhere.

Layout semantics (matches the reference exactly):

* DEDUPLICATED — distinct triangles, each counted once (the CLI
  benchmark path, app/src/triangle_count.rs:8-72).
* SORTED — the reference's merge loop over lists *with duplicates and
  self-loops* counts wedge occurrences: for every occurrence pair
  ``v ∈ N(u), v ≤ u`` and ``w ∈ N(v), w ≤ v``, add 1 if ``w ∈ N(u)``
  (set membership — the put-back iterator parks at the first match).
  The mate golden (scale-8 → 227,874,
  crates/mate/tests/triangle_count_test.py:5-9) is this multiset count
  on the degree-relabeled graph.  Implemented as host wedge expansion +
  device blocked bitmap membership tests.
* UNSORTED — rejected (the reference's merge intersection silently
  requires sorted lists).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from graph_tpu.graph.csr import CsrLayout, UndirectedCsrGraph

# Columns per bitmap block (bits); 4096 bits = 128 u32 words = 512 B/row.
BLOCK_BITS = 4096
# Edges per count chunk; BLOCK_BITS * CHUNK <= 2^30 keeps int32 sums exact.
CHUNK_EDGES = 1 << 18


@dataclasses.dataclass(frozen=True)
class TriangleCountResult:
    """Reference analog: mate's ``TriangleCountResult``
    (crates/mate/src/triangle_count.rs:29-52)."""

    triangles: int
    micros: int


@functools.partial(jax.jit, static_argnames=("n",))
def _build_block_bitmap(u: jax.Array, v: jax.Array, block_start: jax.Array, n: int):
    """Scatter forward edges with ``v`` in the block into an (n, W) bitmap."""
    words = BLOCK_BITS // 32
    local = v - block_start
    in_block = (local >= 0) & (local < BLOCK_BITS)
    row = jnp.where(in_block, u, n)  # n = out of bounds -> dropped
    word = jnp.where(in_block, local // 32, 0)
    bit = (jnp.uint32(1) << (local % 32).astype(jnp.uint32)).astype(jnp.uint32)
    bitmap = jnp.zeros((n, words), dtype=jnp.uint32)
    return bitmap.at[row, word].add(jnp.where(in_block, bit, 0), mode="drop")


@jax.jit
def _count_chunk(bitmap: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Sum of popcount(B[u] & B[v]) over an edge chunk (int32-exact)."""
    bu = bitmap[u]
    bv = bitmap[v]
    pc = jax.lax.population_count(bu & bv).astype(jnp.int32)
    return jnp.sum(pc)


@jax.jit
def _membership_chunk(
    bitmap: jax.Array, u: jax.Array, w: jax.Array, block_start: jax.Array
) -> jax.Array:
    """Count wedges whose bit ``w`` is set in row ``u`` of the block bitmap."""
    local = w - block_start
    valid = (local >= 0) & (local < BLOCK_BITS)
    lw = jnp.where(valid, local, 0)
    words = bitmap[u, lw // 32]
    bit = (words >> (lw % 32).astype(jnp.uint32)) & jnp.uint32(1)
    return jnp.sum(jnp.where(valid, bit, 0).astype(jnp.int32))


def global_triangle_count(graph: UndirectedCsrGraph) -> TriangleCountResult:
    """Count triangles of an undirected graph.

    Mirrors ``global_triangle_count(&g) -> u64`` (triangle_count.rs:22);
    see the module docstring for per-layout semantics.
    """
    if graph.layout is CsrLayout.SORTED:
        return _multiset_triangle_count(graph)
    if graph.layout is not CsrLayout.DEDUPLICATED:
        raise ValueError(
            "global_triangle_count requires CsrLayout.SORTED or "
            "CsrLayout.DEDUPLICATED (the reference's merge intersection "
            "assumes sorted neighbor lists)"
        )
    start = time.perf_counter()
    n = graph.node_count

    # Forward edges (v < u), sorted by v so high blocks can be skipped.
    srcs = np.asarray(graph.csr.sources)
    tgts = np.asarray(graph.csr.targets)
    fwd = tgts < srcs
    u_np = srcs[fwd]
    v_np = tgts[fwd]
    order = np.argsort(v_np, kind="stable")
    u_np, v_np = u_np[order], v_np[order]
    m = u_np.shape[0]

    if m == 0 or n == 0:
        return TriangleCountResult(
            triangles=0, micros=int((time.perf_counter() - start) * 1e6)
        )

    # Adaptive chunk size: small graphs should not pad to the full chunk.
    chunk_edges = 1024
    while chunk_edges < m and chunk_edges < CHUNK_EDGES:
        chunk_edges *= 2

    # Pad the edge list to a whole number of chunks with (0, -1) dummy
    # edges: v = -1 is outside every column block (no bits scattered) and
    # row 0 has no forward neighbors (popcount contribution 0).
    n_chunks = -(-m // chunk_edges)
    pad = n_chunks * chunk_edges - m
    u_np = np.pad(u_np, (0, pad), constant_values=0)
    v_np = np.pad(v_np, (0, pad), constant_values=-1)
    u_dev = jnp.asarray(u_np)
    v_dev = jnp.asarray(v_np)

    n_blocks = -(-n // BLOCK_BITS)
    partials = []
    for b in range(n_blocks):
        block_start = b * BLOCK_BITS
        # First chunk containing an edge with v > block_start (an edge
        # contributes to block b only if some w in F(v) >= block_start,
        # which needs v > block_start).
        first_edge = int(np.searchsorted(v_np[:m], block_start + 1))
        first_chunk = first_edge // chunk_edges
        if first_chunk >= n_chunks:
            continue
        bitmap = _build_block_bitmap(u_dev, v_dev, jnp.int64(block_start).astype(u_dev.dtype), n)
        for c in range(first_chunk, n_chunks):
            s = c * chunk_edges
            partials.append(
                _count_chunk(bitmap, u_dev[s : s + chunk_edges], v_dev[s : s + chunk_edges])
            )

    total = int(np.sum(np.asarray([int(p) for p in partials], dtype=np.int64)))
    micros = int((time.perf_counter() - start) * 1e6)
    return TriangleCountResult(triangles=total, micros=micros)


def _multiset_triangle_count(graph: UndirectedCsrGraph) -> TriangleCountResult:
    """Reference merge-loop semantics on SORTED lists (see module doc)."""
    start = time.perf_counter()
    n = graph.node_count
    srcs = np.asarray(graph.csr.sources)
    tgts = np.asarray(graph.csr.targets)

    # Occurrences with target <= source double as both the e1 pairs
    # (v-occurrence in N(u), v <= u) and the per-node F(v) prefix lists
    # (w-occurrences in N(v), w <= v) — sorted rows keep them prefixes.
    mask = tgts <= srcs
    u1 = srcs[mask].astype(np.int64)
    v1 = tgts[mask].astype(np.int64)
    f_deg = np.bincount(u1, minlength=n)
    f_offsets = np.concatenate([[0], np.cumsum(f_deg)])

    counts = f_deg[v1]
    total_wedges = int(counts.sum())
    if total_wedges == 0:
        return TriangleCountResult(
            triangles=0, micros=int((time.perf_counter() - start) * 1e6)
        )

    # Ragged expansion: wedge i pairs e1 = (u1[r], v1[r]) with the
    # idx-th entry of F(v1[r]).
    rep = np.repeat(np.arange(len(u1)), counts)
    base = np.repeat(f_offsets[v1], counts)
    cum = np.repeat(np.cumsum(counts) - counts, counts)
    idx = base + (np.arange(total_wedges) - cum)
    wedge_u = u1[rep]
    wedge_w = v1[idx]

    # Membership bitmap needs *distinct* (u, x) pairs (scatter-add of
    # duplicate bits would corrupt words); SORTED rows make duplicates
    # adjacent.
    uniq = np.ones(len(srcs), dtype=bool)
    if len(srcs) > 1:
        uniq[1:] = ~((srcs[1:] == srcs[:-1]) & (tgts[1:] == tgts[:-1]))
    eu = srcs[uniq]
    ew = tgts[uniq]

    order = np.argsort(wedge_w, kind="stable")
    wedge_u = wedge_u[order]
    wedge_w = wedge_w[order]

    chunk = 1024
    while chunk < total_wedges and chunk < CHUNK_EDGES:
        chunk *= 2
    n_chunks = -(-total_wedges // chunk)
    pad = n_chunks * chunk - total_wedges
    wedge_u = np.pad(wedge_u, (0, pad), constant_values=0)
    wedge_w = np.pad(wedge_w, (0, pad), constant_values=-1)

    id_dtype = srcs.dtype
    wu_dev = jnp.asarray(wedge_u.astype(id_dtype))
    ww_dev = jnp.asarray(wedge_w.astype(id_dtype))
    eu_dev = jnp.asarray(eu)
    ew_dev = jnp.asarray(ew)

    partials = []
    n_blocks = -(-n // BLOCK_BITS)
    for b in range(n_blocks):
        block_start = b * BLOCK_BITS
        lo = int(np.searchsorted(wedge_w[: total_wedges], block_start))
        hi = int(np.searchsorted(wedge_w[: total_wedges], block_start + BLOCK_BITS))
        if lo == hi:
            continue
        bitmap = _build_block_bitmap(
            eu_dev, ew_dev, jnp.asarray(block_start, dtype=id_dtype), n
        )
        bs = jnp.asarray(block_start, dtype=id_dtype)
        for c in range(lo // chunk, -(-hi // chunk)):
            s = c * chunk
            partials.append(
                _membership_chunk(
                    bitmap, wu_dev[s : s + chunk], ww_dev[s : s + chunk], bs
                )
            )

    total = int(np.sum(np.asarray([int(p) for p in partials], dtype=np.int64)))
    micros = int((time.perf_counter() - start) * 1e6)
    return TriangleCountResult(triangles=total, micros=micros)
