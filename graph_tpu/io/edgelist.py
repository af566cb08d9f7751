"""Edge-list text input (``.el`` / weighted ``.wel``).

Reference analog: ``EdgeListInput`` (crates/builder/src/input/edgelist.rs:
15-278): mmap + one parser thread per page-aligned chunk, byte-level
ASCII digit parsing, Windows-newline handling.

Host-side redesign: the native C++ chunked parser
(:mod:`graph_tpu.native`) is the fast path (same page-boundary chunking
idea, pthread-parallel); pandas' C csv engine is the portable fallback.
Parsing is host work by nature — the device sees only the resulting COO
arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _parse_pandas(path: str, weighted: bool):
    import pandas as pd

    df = pd.read_csv(
        path,
        sep=r"\s+",
        header=None,
        comment=None,
        engine="c",
        dtype={0: np.int64, 1: np.int64, **({2: np.float32} if weighted else {})},
    )
    src = df[0].to_numpy()
    dst = df[1].to_numpy()
    values = df[2].to_numpy(dtype=np.float32) if weighted and df.shape[1] > 2 else None
    return src, dst, values


def read_edge_list(
    path: str, weighted: Optional[bool] = None
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Parse an edge-list file into COO arrays.

    ``weighted=None`` infers from the extension (``.wel`` = weighted,
    mirroring the reference's ``.el``/``.wel`` convention,
    edgelist.rs:23-31).
    """
    if weighted is None:
        weighted = str(path).endswith(".wel")

    try:
        from graph_tpu.native import edge_list_parser

        parsed = edge_list_parser.parse(path, weighted)
        if parsed is not None:
            return parsed
    except ImportError:
        pass

    return _parse_pandas(path, weighted)


class EdgeListInput:
    """``InputCapabilities`` analog for edge lists (edgelist.rs:15-45)."""

    def __init__(self, weighted: Optional[bool] = None):
        self.weighted = weighted

    def read(self, path: str):
        src, dst, values = read_edge_list(path, self.weighted)
        # Reference: node_count = max_node_id + 1 (edgelist.rs:84-90).
        return src, dst, values, None
