"""Node-id dtype policy.

The reference abstracts node-id integer types behind the ``Idx`` trait
(crates/builder/src/index.rs:9-103, implemented for 10 integer types).
On TPU the equivalent is a *dtype policy*: graphs are parametrized by a
JAX integer dtype for ids.  int32 is the default (the reference's Python
bindings fix ids to u32 as well, crates/mate/src/graphs/graph.rs) and
int64 is supported for >2^31-node graphs.

There are no atomics here — the reference's ``fetch_add`` /
``get_and_increment`` (index.rs:29-44) exist to coordinate threads; XLA
programs are data-race-free by construction so nothing replaces them.
"""

from __future__ import annotations

import numpy as np

#: Default id dtype — mirrors graph_mate's fixed u32 ids.
DEFAULT_ID_DTYPE = np.int32

#: Default edge-value / score dtype (reference uses f32 throughout).
DEFAULT_VALUE_DTYPE = np.float32

_SUPPORTED_ID_DTYPES = (np.int32, np.int64)


def canonical_id_dtype(dtype) -> np.dtype:
    """Validate and canonicalize an id dtype.

    Unsigned inputs map onto the signed dtype of the same width (TPUs
    prefer signed int arithmetic; ids are always < 2^31 / 2^63).
    """
    dt = np.dtype(dtype)
    if dt in (np.dtype(np.uint32), np.dtype(np.int32)):
        return np.dtype(np.int32)
    if dt in (np.dtype(np.uint64), np.dtype(np.int64)):
        import jax

        if not jax.config.jax_enable_x64:
            raise TypeError(
                "int64 node ids require 64-bit mode: set JAX_ENABLE_X64=1 "
                "or jax.config.update('jax_enable_x64', True) before "
                "building the graph"
            )
        return np.dtype(np.int64)
    raise TypeError(
        f"Unsupported id dtype {dt!r}; expected one of int32/uint32/int64/uint64"
    )


def check_node_count_fits(node_count: int, dtype) -> None:
    """Raise if ``node_count`` does not fit the id dtype."""
    dt = canonical_id_dtype(dtype)
    if node_count > np.iinfo(dt).max:
        raise OverflowError(
            f"node_count {node_count} exceeds id dtype {dt} "
            f"(max {np.iinfo(dt).max}); use int64 ids"
        )
