"""TPU-native graph ops: batched kNN, neighbour gather/reduce, pooling."""

from graphnet_tpu.ops.knn import (
    knn_graph,
    radius_graph,
    minkowski_knn_graph,
    pairwise_sq_dists,
)
from graphnet_tpu.ops.gather_reduce import (
    gather_neighbors,
    edge_reduce,
    masked_sum,
    masked_mean,
    masked_max,
    masked_min,
    masked_std,
    global_pool,
    broadcast_to_nodes,
    homophily,
    POOLS,
)

__all__ = [
    "knn_graph",
    "radius_graph",
    "minkowski_knn_graph",
    "pairwise_sq_dists",
    "gather_neighbors",
    "edge_reduce",
    "masked_sum",
    "masked_mean",
    "masked_max",
    "masked_min",
    "masked_std",
    "global_pool",
    "broadcast_to_nodes",
    "homophily",
    "POOLS",
]
