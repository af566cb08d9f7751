"""Graph500 binary edge input.

Reference analog: ``Graph500Input`` (crates/builder/src/input/graph500.rs:
7-127): mmap reinterpreted as 12-byte ``PackedEdge {v0_low, v1_low,
high}`` records; ``node_count = edge_count / 16`` (the Graph500
edge-factor convention, graph500.rs:73-74).

Redesign: one structured-dtype numpy view — no per-edge loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_PACKED = np.dtype(
    [("v0_low", "<u4"), ("v1_low", "<u4"), ("high", "<u4")]
)


def read_graph500(path: str) -> Tuple[np.ndarray, np.ndarray, int]:
    """Returns (src, dst, node_count)."""
    raw = np.fromfile(path, dtype=_PACKED)
    edge_count = raw.shape[0]
    node_count = edge_count // 16
    high = raw["high"].astype(np.int64)
    # Bit packing per graph500 generator (graph500.rs:119-127).
    src = raw["v0_low"].astype(np.int64) | ((high & 0xFFFF) << 32)
    dst = raw["v1_low"].astype(np.int64) | ((high >> 16) << 32)
    return src, dst, node_count


class Graph500Input:
    def read(self, path: str):
        src, dst, node_count = read_graph500(path)
        return src, dst, None, node_count
