from graph_tpu.algos.pagerank import PageRankConfig, PageRankResult, page_rank
from graph_tpu.algos.wcc import (
    WccConfig,
    WccResult,
    wcc,
    wcc_afforest,
    wcc_afforest_dss,
    wcc_baseline,
    wcc_components,
)
from graph_tpu.algos.sssp import DeltaSteppingConfig, SsspResult, delta_stepping
from graph_tpu.algos.triangle_count import (
    TriangleCountResult,
    global_triangle_count,
)

__all__ = [
    "PageRankConfig",
    "PageRankResult",
    "page_rank",
    "WccConfig",
    "WccResult",
    "wcc",
    "wcc_baseline",
    "wcc_afforest",
    "wcc_afforest_dss",
    "wcc_components",
    "DeltaSteppingConfig",
    "SsspResult",
    "delta_stepping",
    "TriangleCountResult",
    "global_triangle_count",
]
