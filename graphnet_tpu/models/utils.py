"""Model-level utility functions (mirror of reference
``src/graphnet/models/utils.py``), adapted to the dense-padded
``[B, L, D]`` layout.

The reference operates on PyG packed batches (``[N, D]`` + ``batch``
index); the functions here either work on the padded layout directly or
convert between the two — ``array_to_sequence`` in particular is the
porting bridge for user code written against the packed layout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from graphnet_tpu.ops import homophily, knn_graph


def calculate_distance_matrix(xyz_coords: jax.Array) -> jax.Array:
    """Pairwise Euclidean distances between pulses.

    Mirror of reference ``models/utils.py:32-43``.

    Args:
        xyz_coords: ``[L, 3]`` single event or ``[B, L, 3]`` batch.

    Returns:
        ``[L, L]`` (or ``[B, L, L]``) distance matrix.
    """
    diff = xyz_coords[..., :, None, :] - xyz_coords[..., None, :, :]
    return jnp.sqrt(jnp.sum(diff**2, axis=-1))


def calculate_xyzt_homophily(
    x: jax.Array, idx: jax.Array, edge_mask: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-event homophily of the first four node features (x, y, z, t).

    Mirror of reference ``models/utils.py:13-29`` for the dense layout:
    edges are ``[B, L, k]`` neighbour indices instead of an edge_index.

    Returns:
        Tuple of four ``[B, 1]`` arrays (hx, hy, hz, ht).
    """
    h = homophily(idx, edge_mask, x[..., :4])  # [B, 4], one matmul
    return tuple(h[:, c : c + 1] for c in range(4))


def knn_graph_batch(
    coords: jax.Array,
    mask: jax.Array,
    k: Union[int, Sequence[int]],
) -> Tuple[jax.Array, jax.Array]:
    """kNN edges with a per-event ``k``.

    Mirror of reference ``models/utils.py:46-63`` (per-event k list).
    Computes neighbours once at ``max(k)`` and masks each event's edges
    beyond its own k — one kernel launch, static shapes.

    Args:
        coords: ``[B, L, D]`` positions (kNN feature subset).
        mask: ``[B, L]`` validity mask.
        k: single int or one int per event.

    Returns:
        ``(idx, edge_mask)``: ``[B, L, max_k]`` indices and valid-edge mask.
    """
    ks = jnp.atleast_1d(jnp.asarray(k, jnp.int32))
    B = coords.shape[0]
    if ks.shape[0] not in (1, B):
        raise ValueError(
            f"k must be a scalar or one per event: got {ks.shape[0]} "
            f"values for batch size {B}"
        )
    max_k = int(np.max(np.asarray(k)))
    idx, edge_mask = knn_graph(coords, mask, max_k)
    per_event = ks if ks.shape[0] == B else jnp.full(
        (B,), ks[0], jnp.int32
    )
    rank = jnp.arange(max_k, dtype=jnp.int32)[None, None, :]
    edge_mask = edge_mask & (rank < per_event[:, None, None])
    return idx, edge_mask


def array_to_sequence(
    x: np.ndarray,
    batch_idx: np.ndarray,
    padding_value: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convert packed ``[N, D]`` rows + batch index into padded
    ``[B, L, D]`` + mask + per-event lengths.

    Mirror of reference ``models/utils.py:66-108``; in this framework the
    padded form IS the native layout, so this is the entry bridge for
    packed data (host-side, numpy).

    Args:
        x: ``[N, D]`` rows, grouped by event (``batch_idx`` must be
            non-decreasing, as in PyG batches).
        batch_idx: ``[N]`` event id per row.
        padding_value: fill value for padded slots.

    Returns:
        ``(x_padded [B, L, D], mask [B, L] bool, seq_length [B])``.
    """
    x = np.asarray(x)
    batch_idx = np.asarray(batch_idx)
    if np.any(np.diff(batch_idx) < 0):
        raise ValueError("batch_idx must be non-decreasing")
    uniq, seq_length = np.unique(batch_idx, return_counts=True)
    B, L, D = len(uniq), int(seq_length.max()), x.shape[1]
    out = np.full((B, L, D), padding_value, dtype=x.dtype)
    mask = np.zeros((B, L), dtype=bool)
    start = 0
    for b, n in enumerate(seq_length):
        out[b, :n] = x[start : start + n]
        mask[b, :n] = True
        start += n
    return out, mask, seq_length


def get_fields(
    events: Union[Any, List[Any]], fields: List[str]
) -> np.ndarray:
    """Stack named label fields from one or more events into ``[B, F]``.

    Mirror of reference ``models/utils.py:111-121``; accepts the
    ``Event`` objects produced by the datasets (labels dict) or plain
    dicts.
    """
    if not isinstance(events, list):
        events = [events]

    def value(ev: Any, name: str) -> np.ndarray:
        src: Dict[str, Any]
        if isinstance(ev, dict):
            src = ev
        else:
            src = getattr(ev, "labels", None) or {}
            if name not in src and hasattr(ev, name):
                return np.asarray(getattr(ev, name)).reshape(-1)
        if name not in src:
            raise KeyError(f"field {name!r} not found on event")
        return np.asarray(src[name]).reshape(-1)

    cols = [
        np.concatenate([value(ev, f) for ev in events]) for f in fields
    ]
    return np.stack(cols, axis=1)
