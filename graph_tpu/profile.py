"""Profiling hooks — the TPU analog of the reference's phase timing.

The reference logs wall-clock per phase everywhere
(crates/algos/src/page_rank.rs:98-103 per-iteration, csr.rs:133-139
build phases); graph_tpu keeps those logs AND exposes ``jax.profiler``
trace capture (SURVEY.md §5) so kernel-level timelines can be opened in
TensorBoard / Perfetto.

    with graph_tpu.profile.trace("/tmp/traces"):
        page_rank(g)

or from the CLI: ``graph-tpu page-rank -p g.el --profile /tmp/traces``.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[str]:
    """Capture a jax.profiler trace of the enclosed block.

    Yields the trace directory; view with
    ``tensorboard --logdir <dir>`` or upload to ui.perfetto.dev.
    """
    import jax.profiler

    log_dir = log_dir or os.path.join("/tmp", "graph_tpu_trace")
    os.makedirs(log_dir, exist_ok=True)
    log.info("capturing jax.profiler trace to %s", log_dir)
    with jax.profiler.trace(log_dir):
        yield log_dir
    log.info("trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield
