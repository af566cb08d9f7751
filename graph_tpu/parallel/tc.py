"""Multi-chip triangle count: wedge-partitioned sort-join.

No reference analog (the single-node reference claims 64-node chunks
across rayon threads, crates/algos/src/triangle_count.rs:22-86).  The
TPU-native equivalent: the sort-join counts wedges additively, so ANY
disjoint partition of the wedge-emitting chunk rows is valid — each
chip joins its row block against the (replicated) edge keys and the
per-chip partial counts sum exactly.  Host prep (orient + pack) is
shared with the single-device path (algos/triangle_count.py
_prepare_distinct / _prepare_multiset); only the join shards.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graph_tpu.algos.triangle_count import (
    SENT, SLAB, TriangleCountResult, _emit_cross, _emit_intra, _join_count,
    _pad_edge_keys, _prepare_distinct, _prepare_multiset,
)
from graph_tpu.graph.csr import CsrLayout, UndirectedCsrGraph
from graph_tpu.parallel.mesh import NODES_AXIS


@functools.lru_cache(maxsize=64)
def _sharded_runner(mesh: Mesh, axis: str, kind: str, cap: int,
                    rows_per: int, ngroups: int):
    """Compiled shard_map: each device joins its contiguous row block
    (ngroups x rows_per rows) against the replicated edge keys and
    returns per-group partial counts (host-summed as python ints —
    each group counts < SLAB + |E| so int32 never overflows)."""
    if kind == "intra":
        def dev_fn(mat_l, ev, ew):
            def body(g):
                sub = jax.lax.dynamic_slice_in_dim(
                    mat_l, g * rows_per, rows_per)
                v, w = _emit_intra(sub, cap)
                return _join_count(v, w, ev, ew)
            return jnp.stack([body(g) for g in range(ngroups)])
        in_specs = (P(axis), P(), P())
    else:
        def dev_fn(a_l, b_l, ev, ew):
            def body(g):
                sa = jax.lax.dynamic_slice_in_dim(a_l, g * rows_per,
                                                  rows_per)
                sb = jax.lax.dynamic_slice_in_dim(b_l, g * rows_per,
                                                  rows_per)
                v, w = _emit_cross(sa, sb)
                return _join_count(v, w, ev, ew)
            return jnp.stack([body(g) for g in range(ngroups)])
        in_specs = (P(axis), P(axis), P(), P())
    return jax.jit(shard_map(dev_fn, mesh=mesh, in_specs=in_specs,
                             out_specs=P(axis)))


def _class_count(mesh, axis, kind, mats, ev_dev, ew_dev, cap=0):
    """Join one degree class / cross-pair set across the mesh."""
    Pn = int(mesh.shape[axis])
    if kind == "intra":
        rows = mats.shape[0]
        per = max(1, cap * (cap - 1) // 2)
    else:
        rows = mats[0].shape[0]
        per = max(1, mats[0].shape[1] * mats[1].shape[1])
    # per-device slab-sized groups, but never blow tiny matrices up to
    # a full slab of pad rows (CPU-mesh tests)
    rows_per = max(1, min(SLAB // per, -(-rows // Pn)))
    ngroups = -(-rows // (Pn * rows_per))
    total = ngroups * Pn * rows_per

    def pad(M):
        return np.pad(M, ((0, total - M.shape[0]), (0, 0)),
                      constant_values=SENT)

    run = _sharded_runner(mesh, axis, kind, cap, rows_per, ngroups)
    if kind == "intra":
        out = run(jnp.asarray(pad(mats)), ev_dev, ew_dev)
    else:
        out = run(jnp.asarray(pad(mats[0])), jnp.asarray(pad(mats[1])),
                  ev_dev, ew_dev)
    return int(np.asarray(out).sum())


def triangle_count_sharded(graph: UndirectedCsrGraph, mesh: Mesh,
                           axis: str = NODES_AXIS) -> TriangleCountResult:
    """Triangle count over a device mesh; exact (bit-equal counts).

    Semantics follow the graph layout exactly like the single-device
    entry (DEDUPLICATED = distinct, SORTED = reference multiset);
    ``tests/test_distributed.py`` asserts equality with the
    single-device counts, including the scale-8 multiset golden
    227,874 (crates/mate/tests/triangle_count_test.py:5-9).
    """
    if axis not in mesh.axis_names:
        axis = mesh.axis_names[0]
    start = time.perf_counter()
    if graph.layout is CsrLayout.SORTED:
        prep = _prepare_multiset(graph)
        if prep is None:
            return TriangleCountResult(
                triangles=0,
                micros=int((time.perf_counter() - start) * 1e6))
        A, B, eu, ew = prep
        evd, ewd = map(jnp.asarray, _pad_edge_keys(eu, ew))
        count = _class_count(mesh, axis, "cross", (A, B), evd, ewd)
    elif graph.layout is CsrLayout.DEDUPLICATED:
        prep = _prepare_distinct(graph)
        if prep is None:
            return TriangleCountResult(
                triangles=0,
                micros=int((time.perf_counter() - start) * 1e6))
        mats, cross, a, b = prep
        evd, ewd = map(jnp.asarray, _pad_edge_keys(a, b))
        count = 0
        for cap, mat in (mats or {}).items():
            count += _class_count(mesh, axis, "intra", mat, evd, ewd,
                                  cap=cap)
        if cross is not None:
            count += _class_count(mesh, axis, "cross", cross, evd, ewd)
    else:
        raise ValueError(
            "triangle_count_sharded requires CsrLayout.SORTED or "
            "CsrLayout.DEDUPLICATED")
    micros = int((time.perf_counter() - start) * 1e6)
    return TriangleCountResult(triangles=count, micros=micros)
