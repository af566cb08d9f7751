from graph_tpu.parallel.mesh import (
    make_mesh,
    get_default_mesh,
    set_default_mesh,
    use_mesh,
)
from graph_tpu.parallel.pagerank import (
    ShardedPullGraph,
    page_rank_sharded,
    shard_graph,
)
from graph_tpu.parallel.sssp import shard_weighted_graph, sssp_sharded
from graph_tpu.parallel.wcc import shard_hook_graph, wcc_sharded

__all__ = [
    "make_mesh",
    "get_default_mesh",
    "set_default_mesh",
    "use_mesh",
    "ShardedPullGraph",
    "shard_graph",
    "page_rank_sharded",
    "shard_hook_graph",
    "wcc_sharded",
    "shard_weighted_graph",
    "sssp_sharded",
]
