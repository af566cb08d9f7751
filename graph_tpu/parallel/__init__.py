from graph_tpu.parallel.mesh import make_mesh
from graph_tpu.parallel.pagerank import ShardedPullGraph, page_rank_sharded, shard_graph
from graph_tpu.parallel.wcc import wcc_sharded

__all__ = [
    "make_mesh",
    "ShardedPullGraph",
    "shard_graph",
    "page_rank_sharded",
    "wcc_sharded",
]
