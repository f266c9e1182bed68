"""Host-side (numpy) utilities for graph construction.

Mirrors of reference ``src/graphnet/models/graphs/utils.py``: lexicographic
cluster sorting, percentile summarisation, and the IceCube ice-transparency
interpolators (``:175-209``)."""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from graphnet_tpu.constants import ICE_PROPERTIES_DIR


def lex_sort(x: np.ndarray, cluster_columns: List[int]) -> np.ndarray:
    """Sort rows of ``x`` lexicographically by ``cluster_columns`` (last
    listed column varies slowest — numpy lexsort convention, reference
    ``utils.py:12-29``)."""
    keys = tuple(x[:, c] for c in cluster_columns)
    return x[np.lexsort(keys), :]


def identify_indices(
    feature_names: List[str], cluster_on: List[str]
) -> Tuple[List[int], List[int], List[str]]:
    """Split features into cluster columns and summarisation columns
    (reference ``utils.py:104-117``)."""
    summ_names = [f for f in feature_names if f not in cluster_on]
    cluster_idx = [feature_names.index(c) for c in cluster_on]
    summ_idx = [feature_names.index(c) for c in summ_names]
    return cluster_idx, summ_idx, summ_names


def gather_cluster_sequence(
    x: np.ndarray, feature_idx: int, cluster_columns: List[int]
) -> Tuple[np.ndarray, int, np.ndarray]:
    """Group rows by cluster key; gather ``feature_idx`` values per cluster
    into NaN-padded rows (reference ``utils.py:32-98``).

    Returns ``(array [n_clusters, n_key_cols + max_count], column_offset,
    counts)``; clusters ordered lexicographically by key.
    """
    x = lex_sort(x, cluster_columns)
    keys = x[:, cluster_columns]
    # lex_sort ordering groups equal keys contiguously; np.unique(axis=0)
    # returns keys in lexicographic order of *columns reversed* relative to
    # lexsort, so recompute boundaries directly from the sorted array.
    change = np.any(keys[1:] != keys[:-1], axis=1)
    boundaries = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(x)]])
    counts = np.diff(boundaries).astype(int)
    n_clusters = len(counts)
    unique_keys = keys[boundaries[:-1]]
    width = counts.max() if n_clusters else 0
    array = np.full((n_clusters, len(cluster_columns) + width), np.nan)
    array[:, : len(cluster_columns)] = unique_keys
    offset = len(cluster_columns)
    for k in range(n_clusters):
        seg = x[boundaries[k] : boundaries[k + 1], feature_idx]
        array[k, offset : offset + counts[k]] = seg
    return array, offset, counts


def cluster_summarize_with_percentiles(
    x: np.ndarray,
    summarization_indices: List[int],
    cluster_indices: List[int],
    percentiles: List[int],
    add_counts: bool,
) -> np.ndarray:
    """Cluster rows by ``cluster_indices``; summarise each summarisation
    column with the given percentiles; optionally append log10 counts
    (reference ``utils.py:120-172``)."""
    blocks = []
    array = None
    for feature_idx in summarization_indices:
        summarized, offset, counts = gather_cluster_sequence(
            x, feature_idx, cluster_indices
        )
        if array is None:
            array = summarized[:, :offset]
        pct = np.nanpercentile(
            summarized[:, offset:], percentiles, axis=1
        ).T
        blocks.append(pct)
    assert array is not None, "no summarization columns"
    out = np.concatenate([array] + blocks, axis=1)
    if add_counts:
        out = np.concatenate(
            [out, np.log10(counts).reshape(-1, 1)], axis=1
        )
    return out


def ice_transparency(
    z_offset: Optional[float] = None, z_scaling: Optional[float] = None
) -> Tuple[Callable, Callable]:
    """Interpolators for normalised IceCube scattering/absorption lengths vs
    normalised depth (reference ``utils.py:175-209``; data from
    arXiv:1301.5361 p.31).  Assumes pulses have z scaled by 1/500.

    The reference uses sklearn ``RobustScaler`` (median/IQR); replicated
    directly with numpy to avoid the dependency on the hot path.
    """
    import pandas as pd
    from scipy.interpolate import interp1d

    df = pd.read_parquet(
        os.path.join(ICE_PROPERTIES_DIR, "ice_transparency.parquet")
    )
    z_offset = z_offset if z_offset is not None else -1950.0
    z_scaling = z_scaling if z_scaling is not None else 500.0
    z_norm = (df["depth"].to_numpy() + z_offset) / z_scaling

    def robust(col: np.ndarray) -> np.ndarray:
        med = np.median(col)
        q1, q3 = np.percentile(col, [25, 75])
        return (col - med) / (q3 - q1)

    scatt = robust(df["scattering_len"].to_numpy())
    absorb = robust(df["absorption_len"].to_numpy())
    return interp1d(z_norm, scatt), interp1d(z_norm, absorb)
