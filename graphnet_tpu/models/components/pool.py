"""Pooling / grouping utilities (mirror of reference
``src/graphnet/models/components/pool.py:20-266``).

Device-side pooling over padded batches lives in
:mod:`graphnet_tpu.ops.gather_reduce`; this module adds the group-by
utilities used for DOM/PMT-level clustering, in both a host (numpy) and a
device (segment-id) form.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphnet_tpu.ops import (
    masked_max,
    masked_mean,
    masked_min,
    masked_std,
    masked_sum,
)

# re-exported reference names (dense-padded semantics)
min_pool = masked_min
max_pool = masked_max
sum_pool = masked_sum
avg_pool = masked_mean
std_pool = masked_std


def group_by_np(x: np.ndarray, columns: Sequence[int]) -> np.ndarray:
    """Cluster index per row from unique combinations of ``columns``
    (reference ``group_by``, ``pool.py:69-109``)."""
    _, inverse = np.unique(
        x[:, list(columns)], axis=0, return_inverse=True
    )
    return inverse


def group_pulses_to_dom(
    x: np.ndarray, features: List[str]
) -> np.ndarray:
    """Group pulses by DOM (reference ``pool.py:112-116``)."""
    cols = [features.index(c) for c in ("dom_x", "dom_y", "dom_z")]
    return group_by_np(x, cols)


def group_pulses_to_pmt(
    x: np.ndarray, features: List[str]
) -> np.ndarray:
    """Group pulses by PMT (reference ``pool.py:118-121``)."""
    cols = [
        features.index(c)
        for c in ("dom_x", "dom_y", "dom_z", "pmt_number")
        if c in features
    ]
    return group_by_np(x, cols)


def sum_pool_and_distribute(
    x: jax.Array, cluster: jax.Array, num_clusters: int
) -> jax.Array:
    """Sum features within clusters and broadcast the sums back to every
    member (reference ``pool.py:55-66``).

    Args:
        x: ``[N, D]`` node features (one event, unpadded or masked rows
            assigned to a scrap cluster).
        cluster: ``[N]`` int cluster ids.
        num_clusters: static upper bound on cluster count.
    """
    sums = jax.ops.segment_sum(x, cluster, num_segments=num_clusters)
    return sums[cluster]


def segment_pool(
    x: jax.Array,
    cluster: jax.Array,
    num_clusters: int,
    aggr: str = "mean",
) -> jax.Array:
    """Segment reduction over cluster ids (device-side ``*_pool_x``)."""
    if aggr in ("sum", "add"):
        return jax.ops.segment_sum(x, cluster, num_segments=num_clusters)
    if aggr == "mean":
        s = jax.ops.segment_sum(x, cluster, num_segments=num_clusters)
        n = jax.ops.segment_sum(
            jnp.ones_like(cluster, dtype=x.dtype),
            cluster,
            num_segments=num_clusters,
        )
        return s / jnp.maximum(n, 1.0)[..., None] if x.ndim > 1 else (
            s / jnp.maximum(n, 1.0)
        )
    if aggr == "min":
        return jax.ops.segment_min(x, cluster, num_segments=num_clusters)
    if aggr == "max":
        return jax.ops.segment_max(x, cluster, num_segments=num_clusters)
    raise ValueError(f"unknown aggregation {aggr!r}")
