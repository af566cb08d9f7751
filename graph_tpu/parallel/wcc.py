"""Multi-chip WCC: row-block sharded min-label propagation.

No reference analog (single-node reference).  Same sharding pattern as
:mod:`graph_tpu.parallel.pagerank`: each chip owns a block of node rows
plus the out-edges leaving them; hooks propagate labels with a local
segment-min, the global label vector travels by all_gather, convergence
by psum of change flags.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graph_tpu.algos.wcc import WccConfig, WccResult
from graph_tpu.graph.csr import DirectedCsrGraph, UndirectedCsrGraph
from graph_tpu.parallel.mesh import NODES_AXIS


@dataclasses.dataclass(frozen=True)
class ShardedHookGraph:
    """Row-block sharded out-CSR (+ in-CSR) edge arrays for hook steps."""

    fwd_targets: jax.Array  # (P, mf_pad)
    fwd_offsets: jax.Array  # (P, rows_per+1)
    bwd_targets: jax.Array  # (P, mb_pad)
    bwd_offsets: jax.Array  # (P, rows_per+1)
    node_count: int


def _block_csr(offsets, targets, n, P_, rows_per):
    offsets = np.asarray(offsets, dtype=np.int64)
    targets = np.asarray(targets)
    starts = [int(offsets[min(p * rows_per, n)]) for p in range(P_ + 1)]
    m_pad = max(max(starts[p + 1] - starts[p] for p in range(P_)), 1)
    tgt = np.zeros((P_, m_pad), dtype=targets.dtype)
    off = np.zeros((P_, rows_per + 1), dtype=np.int32)
    for p in range(P_):
        lo, hi = starts[p], starts[p + 1]
        tgt[p, : hi - lo] = targets[lo:hi]
        row_lo = min(p * rows_per, n)
        row_hi = min(p * rows_per + rows_per, n)
        local = offsets[row_lo : row_hi + 1] - offsets[row_lo]
        off[p, : row_hi - row_lo + 1] = local
        off[p, row_hi - row_lo + 1 :] = local[-1] if len(local) else 0
    return tgt, off


def shard_hook_graph(graph, mesh: Mesh, axis: str = NODES_AXIS) -> ShardedHookGraph:
    P_ = mesh.shape[axis]
    n = graph.node_count
    rows_per = -(-n // P_)
    if isinstance(graph, UndirectedCsrGraph):
        fwd = bwd = graph.csr
    else:
        fwd, bwd = graph.csr_out, graph.csr_in
    ft, fo = _block_csr(fwd.offsets, fwd.targets, n, P_, rows_per)
    bt, bo = _block_csr(bwd.offsets, bwd.targets, n, P_, rows_per)
    shard = NamedSharding(mesh, P(axis))
    return ShardedHookGraph(
        fwd_targets=jax.device_put(jnp.asarray(ft), shard),
        fwd_offsets=jax.device_put(jnp.asarray(fo), shard),
        bwd_targets=jax.device_put(jnp.asarray(bt), shard),
        bwd_offsets=jax.device_put(jnp.asarray(bo), shard),
        node_count=n,
    )


def _segment_min_by_offsets(vals: jax.Array, offsets: jax.Array, rows: int) -> jax.Array:
    """Per-row min over offset-delimited, variable-length edge slices.

    Min has no prefix-difference trick (cummin is not invertible), so
    this uses segment_min over derived row ids; replacing it with the
    Pallas segmented-reduce engine is tracked performance work.
    """
    row_ids = jnp.searchsorted(
        offsets, jnp.arange(vals.shape[0], dtype=offsets.dtype), side="right"
    ) - 1
    return jax.ops.segment_min(
        vals, row_ids, num_segments=rows, indices_are_sorted=True
    )


def wcc_sharded(
    sg: ShardedHookGraph,
    mesh: Mesh,
    config: Optional[WccConfig] = None,
    axis: str = NODES_AXIS,
) -> WccResult:
    import time

    del config
    start = time.perf_counter()
    n = sg.node_count
    P_ = mesh.shape[axis]
    rows_per = sg.fwd_offsets.shape[1] - 1
    n_pad = rows_per * P_

    def shard_fn(ft, fo, bt, bo):
        ft, fo, bt, bo = ft[0], fo[0], bt[0], bo[0]
        me = jax.lax.axis_index(axis)
        comp0 = (me * rows_per + jnp.arange(rows_per, dtype=ft.dtype))

        def cond(state):
            _, changed, _ = state
            return changed

        def body(state):
            comp, _, it = state
            full = jax.lax.all_gather(comp, axis, tiled=True)  # (n_pad,)
            m1 = _segment_min_by_offsets(full[ft], fo, rows_per)
            m2 = _segment_min_by_offsets(full[bt], bo, rows_per)
            new = jnp.minimum(comp, jnp.minimum(m1, m2))
            # pointer jumping on the global vector
            full2 = jax.lax.all_gather(new, axis, tiled=True)
            new = full2[new]
            new = full2[new]
            changed = jax.lax.psum(
                jnp.any(new != comp).astype(jnp.int32), axis
            ) > 0
            return new, changed, it + 1

        comp, _, iters = jax.lax.while_loop(
            cond, body, (comp0, jnp.bool_(True), jnp.int32(0))
        )
        return comp[None], iters

    mapped = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P()),
        )
    )
    comp, iters = mapped(sg.fwd_targets, sg.fwd_offsets, sg.bwd_targets, sg.bwd_offsets)
    comp = comp.reshape(-1)[:n]
    comp.block_until_ready()
    micros = int((time.perf_counter() - start) * 1e6)
    return WccResult(components=comp, ran_iterations=int(iters), micros=micros)
