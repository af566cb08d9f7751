"""Device-side CSR construction from COO edge streams.

Reference analog: the parallel CSR builder
``Csr::from((&E, NI, Direction, CsrLayout))``
(crates/builder/src/graph/csr.rs:124-221): atomic degree count →
sequential prefix sum → atomic-fetch_add scatter → per-node sort/dedup.

TPU-first redesign — no atomics, no scatter races; everything is a sort:

1. lexicographic device sort of the COO arrays (``jax.lax.sort`` with
   ``num_keys``; stable single-key sort preserves the reference's
   "unsorted" per-row input order),
2. ``offsets`` via vectorized binary search of each row id in the sorted
   row array (replaces degree-count + prefix sum in one op),
3. DEDUPLICATED layout: adjacent-unique mask + compaction (replaces
   ``sort_and_deduplicate_targets``, csr.rs:897-948, including self-loop
   removal).

The only host sync is the dedup count (output size must be static).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_tpu.dtypes import canonical_id_dtype, check_node_count_fits
from graph_tpu.graph.csr import (
    Csr,
    CsrLayout,
    DirectedCsrGraph,
    UndirectedCsrGraph,
)


def _as_device_ids(arr, dtype) -> jax.Array:
    a = jnp.asarray(arr)
    if a.dtype != dtype:
        a = a.astype(dtype)
    return a


def _sorted_coo(
    rows: jax.Array,
    cols: jax.Array,
    values: Optional[jax.Array],
    sort_cols: bool,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Sort COO by row (stable) or lexicographically by (row, col)."""
    operands = [rows, cols] + ([values] if values is not None else [])
    num_keys = 2 if sort_cols else 1
    out = jax.lax.sort(operands, num_keys=num_keys, is_stable=True)
    rows_s, cols_s = out[0], out[1]
    vals_s = out[2] if values is not None else None
    return rows_s, cols_s, vals_s


def _offsets_from_sorted_rows(rows_sorted: jax.Array, node_count: int) -> jax.Array:
    """offsets[i] = first edge index whose row >= i, for i in 0..n."""
    probes = jnp.arange(node_count + 1, dtype=rows_sorted.dtype)
    return jnp.searchsorted(rows_sorted, probes, side="left").astype(
        rows_sorted.dtype
    )


def _dedup_mask(rows: jax.Array, cols: jax.Array) -> jax.Array:
    """True for edges to keep: first of each (row, col) run, no self-loops."""
    first = jnp.ones(rows.shape, dtype=bool)
    if rows.shape[0] > 1:
        same = (rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1])
        first = first.at[1:].set(~same)
    return first & (rows != cols)


@jax.jit
def _dedup_mask_count(rows: jax.Array, cols: jax.Array):
    mask = _dedup_mask(rows, cols)
    return mask, jnp.sum(mask.astype(jnp.int32))


@jax.jit
def _compact_by_mask(mask: jax.Array, operands):
    """Stable-sort dropped edges to the back (kept edges keep their
    order); the caller slices the host-synced count.  One sort program
    instead of nonzero + per-array gathers (the nonzero lowering alone
    cost ~1 min of remote compile per shape on the TPU tunnel)."""
    key = (~mask).astype(jnp.int32)
    return jax.lax.sort([key] + list(operands), num_keys=1,
                        is_stable=True)[1:]


def csr_from_coo(
    rows,
    cols,
    values=None,
    *,
    node_count: int,
    layout: CsrLayout = CsrLayout.UNSORTED,
    id_dtype=None,
    static_shapes: Optional[bool] = None,
) -> Csr:
    """Build one CSR direction from a COO edge stream on device.

    ``static_shapes`` controls the DEDUPLICATED compaction: False (the
    eager default) host-syncs the kept-edge count and returns exactly
    sized arrays; True keeps all m slots, moves duplicates/self-loops
    to a sentinel-row tail (row = node_count) and lets ``offsets``
    ignore them — fully traceable, so dedup builds work under
    ``jax.jit`` / ``shard_map`` (offsets[-1] is the real edge count;
    consumers reading raw edge arrays slice by it).  None auto-selects:
    padded when the inputs are tracers.
    """
    id_dtype = canonical_id_dtype(
        id_dtype if id_dtype is not None else np.asarray(rows).dtype
        if hasattr(rows, "dtype")
        else np.int32
    )
    check_node_count_fits(node_count, id_dtype)

    rows = _as_device_ids(rows, id_dtype)
    cols = _as_device_ids(cols, id_dtype)
    if values is not None:
        values = jnp.asarray(values)

    sort_cols = layout in (CsrLayout.SORTED, CsrLayout.DEDUPLICATED)
    rows_s, cols_s, vals_s = _sorted_coo(rows, cols, values, sort_cols)

    if layout is CsrLayout.DEDUPLICATED and rows_s.shape[0] > 0:
        if static_shapes is None:
            static_shapes = isinstance(rows_s, jax.core.Tracer)
        if static_shapes:
            # padded formulation: dropped edges become sentinel rows at
            # the back; searchsorted probes stop at node_count, so the
            # offsets (and every offsets-driven op) never see them
            mask = _dedup_mask(rows_s, cols_s)
            sent = jnp.asarray(node_count).astype(rows_s.dtype)
            rows_m = jnp.where(mask, rows_s, sent)
            cols_m = jnp.where(mask, cols_s, sent)
            ops = [rows_m, cols_m] + ([vals_s] if vals_s is not None else [])
            out = jax.lax.sort(ops, num_keys=2, is_stable=True)
            rows_s, cols_s = out[0], out[1]
            if vals_s is not None:
                vals_s = out[2]
        else:
            mask, cnt = _dedup_mask_count(rows_s, cols_s)
            keep = int(cnt)  # host sync: output size must be static
            ops = [rows_s, cols_s] + ([vals_s] if vals_s is not None else [])
            out = _compact_by_mask(mask, ops)
            rows_s = out[0][:keep]
            cols_s = out[1][:keep]
            if vals_s is not None:
                vals_s = out[2][:keep]

    offsets = _offsets_from_sorted_rows(rows_s, node_count)
    return Csr(offsets=offsets, sources=rows_s, targets=cols_s, values=vals_s)


def _infer_node_count(src, dst, node_count: Optional[int]) -> int:
    if node_count is not None:
        return int(node_count)
    # Reference: EdgeList::max_node_id() par-reduce (input/edgelist.rs:84-90);
    # node_count = max id + 1.
    src = np.asarray(src)
    dst = np.asarray(dst)
    if src.size == 0:
        return 0
    return int(max(src.max(), dst.max())) + 1


def build_directed(
    src,
    dst,
    values=None,
    *,
    node_count: Optional[int] = None,
    layout: CsrLayout = CsrLayout.UNSORTED,
    id_dtype=np.int32,
    node_values=None,
) -> DirectedCsrGraph:
    """Build a directed graph (out-CSR + in-CSR).

    Reference analog: ``DirectedCsrGraph::from((edge_list, layout))``
    (csr.rs:522-544) — one CSR pass per direction.
    """
    n = _infer_node_count(src, dst, node_count)
    csr_out = csr_from_coo(
        src, dst, values, node_count=n, layout=layout, id_dtype=id_dtype
    )
    csr_in = csr_from_coo(
        dst, src, values, node_count=n, layout=layout, id_dtype=id_dtype
    )
    nv = jnp.asarray(node_values) if node_values is not None else None
    return DirectedCsrGraph(csr_out=csr_out, csr_in=csr_in, node_values=nv, layout=layout)


def build_undirected_host(
    src,
    dst,
    values=None,
    *,
    node_count: Optional[int] = None,
    layout: CsrLayout = CsrLayout.UNSORTED,
    id_dtype=np.int32,
    node_values=None,
) -> UndirectedCsrGraph:
    """Host-resident undirected build (numpy arrays in the Csr).

    For host->device pipelines — triangle counting above all — whose
    prep reads the whole edge list back on the host: downloading a
    device-built graph through the TPU tunnel runs at ~0.2 MB/s
    (minutes for scale-20), while numpy arrays used as jit arguments
    upload at ~53 MB/s when (and only when) a device op needs them.
    Results are identical to :func:`build_undirected`.
    """
    n = _infer_node_count(src, dst, node_count)
    dt = canonical_id_dtype(id_dtype)
    check_node_count_fits(n, dt)
    src = np.asarray(src)
    dst = np.asarray(dst)
    nv = None if node_values is None else np.asarray(node_values)

    if dt == np.int32:  # the C++ radix builder emits int32 ids
        from graph_tpu.native.host_csr import build_undirected_native

        code = {CsrLayout.UNSORTED: 0, CsrLayout.SORTED: 1,
                CsrLayout.DEDUPLICATED: 2}[layout]
        native = build_undirected_native(
            src, dst, np.asarray(values) if values is not None else None,
            n, code)
        if native is not None:
            offsets, rows, cols, vals = native
            csr = Csr(offsets=offsets, sources=rows, targets=cols,
                      values=vals)
            return UndirectedCsrGraph(csr=csr, node_values=nv,
                                      layout=layout)

    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    vals = None
    if values is not None:
        values = np.asarray(values)
        vals = np.concatenate([values, values])
    if layout in (CsrLayout.SORTED, CsrLayout.DEDUPLICATED):
        order = np.lexsort((cols, rows))
    else:
        order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    if vals is not None:
        vals = vals[order]
    if layout is CsrLayout.DEDUPLICATED and rows.size:
        keep = np.ones(rows.size, bool)
        keep[1:] = ~((rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1]))
        keep &= rows != cols
        rows, cols = rows[keep], cols[keep]
        if vals is not None:
            vals = vals[keep]
    offsets = np.searchsorted(rows, np.arange(n + 1)).astype(dt)
    csr = Csr(offsets=offsets, sources=rows.astype(dt),
              targets=cols.astype(dt),
              values=None if vals is None else vals.astype(np.float32))
    return UndirectedCsrGraph(csr=csr, node_values=nv, layout=layout)


def build_undirected(
    src,
    dst,
    values=None,
    *,
    node_count: Optional[int] = None,
    layout: CsrLayout = CsrLayout.UNSORTED,
    id_dtype=np.int32,
    node_values=None,
) -> UndirectedCsrGraph:
    """Build an undirected graph: both directions in one CSR.

    Reference analog: undirected CSR construction feeding each input edge
    in both directions (csr.rs:658-690); ``edge_count`` stays the input
    edge count (targets/2).
    """
    n = _infer_node_count(src, dst, node_count)
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    rows = jnp.concatenate([src, dst])
    cols = jnp.concatenate([dst, src])
    vals = None
    if values is not None:
        values = jnp.asarray(values)
        vals = jnp.concatenate([values, values])
    csr = csr_from_coo(rows, cols, vals, node_count=n, layout=layout, id_dtype=id_dtype)
    nv = jnp.asarray(node_values) if node_values is not None else None
    return UndirectedCsrGraph(csr=csr, node_values=nv, layout=layout)
