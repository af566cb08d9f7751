"""Synthetic graph generators for benchmarks.

Reference analog: the criterion bench harness's seeded uniform edge-list
generator and LDBC Graph500 downloader
(crates/builder/benches/common/mod.rs:15-119).  The downloader is
replaced by a device-side RMAT generator (same family as the LDBC
Graphalytics datasets) since this environment has no network egress.

TPU-first: RMAT bits are drawn with the JAX threefry PRNG directly on
device — generating scale-24 (268M edges) takes milliseconds and never
touches the host.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit, static_argnames=("scale", "edge_factor", "permute")
)
def rmat_edges(
    key: jax.Array,
    *,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    permute: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Generate an RMAT edge list on device.

    Graph500 parameters by default (a=0.57, b=0.19, c=0.19, d=0.05,
    edge_factor=16).  ``permute=True`` shuffles vertex labels like the
    Graph500 generator so degree has no correlation with id.
    Returns (src, dst) int32 arrays of length ``edge_factor << scale``.
    """
    n = 1 << scale
    m = edge_factor << scale
    kq, kp = jax.random.split(key)

    # One uniform draw per (edge, bit), one bit level at a time to keep
    # peak memory at O(m) instead of O(m * scale).
    def bit_level(level, carry):
        src, dst = carry
        r = jax.random.uniform(
            jax.random.fold_in(kq, level), (m,), dtype=jnp.float32
        )
        src_bit = (r >= (a + b)).astype(jnp.int32)  # quadrants c, d
        dst_bit = (((r >= a) & (r < a + b)) | (r >= (a + b + c))).astype(
            jnp.int32
        )  # quadrants b, d
        weight = jnp.int32(1) << level
        return src + src_bit * weight, dst + dst_bit * weight

    zeros = jnp.zeros((m,), dtype=jnp.int32)
    src, dst = jax.lax.fori_loop(0, scale, bit_level, (zeros, zeros))
    if permute:
        perm = jax.random.permutation(kp, n).astype(jnp.int32)
        src = perm[src]
        dst = perm[dst]
    return src, dst


def uniform_edge_list(
    node_count: int, edge_count: int, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded uniform random edge list.

    Reference analog: ``uniform_edge_list``
    (benches/common/mod.rs:88-108) with SMALL/MEDIUM/LARGE =
    1k/10k/100k nodes × 10 average degree.
    """
    rng = np.random.default_rng(seed)
    src = rng.integers(0, node_count, edge_count, dtype=np.int64)
    dst = rng.integers(0, node_count, edge_count, dtype=np.int64)
    return src, dst


# Reference bench sizes (benches/common/mod.rs:71-86).
SMALL = (1_000, 10_000)
MEDIUM = (10_000, 100_000)
LARGE = (100_000, 1_000_000)
