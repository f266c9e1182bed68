"""Coarsening (local pooling) operations — host-side numpy mirrors of the
reference ``src/graphnet/models/coarsening.py:54-327``.

A Coarsening maps one :class:`~graphnet_tpu.models.graphs.graph_definition.
Event` to a new Event whose nodes are clusters (e.g. DOMs) with reduced
features.  They compose with the data pipeline exactly like node
definitions: run inside the dataloader, before padding.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from graphnet_tpu.models.graphs.graph_definition import Event

_REDUCERS = {
    "avg": np.mean,
    "min": np.min,
    "max": np.max,
    "sum": np.sum,
}


def _segment_reduce(
    values: np.ndarray, cluster: np.ndarray, n_clusters: int, fn
) -> np.ndarray:
    out = np.zeros((n_clusters,) + values.shape[1:], values.dtype)
    for c in range(n_clusters):
        sel = values[cluster == c]
        if len(sel):
            out[c] = fn(sel, axis=0)
    return out


class Coarsening:
    """Base coarsening: cluster nodes, reduce features per cluster."""

    def __init__(
        self, reduce: str = "avg", transfer_attributes: bool = True
    ):
        assert reduce in _REDUCERS, f"unknown reduce {reduce!r}"
        self._reduce = _REDUCERS[reduce]
        self._transfer_attributes = transfer_attributes

    def _perform_clustering(self, event: Event) -> np.ndarray:
        raise NotImplementedError

    def _additional_features(
        self, cluster: np.ndarray, event: Event
    ) -> Optional[np.ndarray]:
        return None

    def __call__(self, event: Event) -> Event:
        cluster = self._perform_clustering(event)
        # compact cluster ids, ordered by first occurrence (torch unique
        # return_inverse semantics used by group_by, pool.py:69-109)
        _, inverse = np.unique(cluster, return_inverse=True)
        n = int(inverse.max()) + 1 if len(inverse) else 0
        x = _segment_reduce(event.x, inverse, n, self._reduce)
        extra = self._additional_features(inverse, event)
        if extra is not None:
            x = np.concatenate([x, extra], axis=1)
        new_event = Event(
            x=x.astype(np.float32),
            features=list(event.features),
            labels=dict(event.labels) if self._transfer_attributes else {},
            node_labels={},
        )
        if self._transfer_attributes:
            for k, v in event.node_labels.items():
                new_event.node_labels[k] = _segment_reduce(
                    np.asarray(v), inverse, n, self._reduce
                )
        return new_event


class AttributeCoarsening(Coarsening):
    """Cluster on arbitrary named attributes (reference ``:196-214``)."""

    def __init__(
        self,
        attributes: List[str],
        reduce: str = "avg",
        transfer_attributes: bool = True,
    ):
        super().__init__(reduce, transfer_attributes)
        self._attributes = attributes

    def _perform_clustering(self, event: Event) -> np.ndarray:
        cols = [event.features.index(a) for a in self._attributes]
        keys = event.x[:, cols]
        _, inverse = np.unique(keys, axis=0, return_inverse=True)
        return inverse


class DOMCoarsening(AttributeCoarsening):
    """Cluster pulses on the same DOM (reference ``:217-242``)."""

    def __init__(
        self,
        reduce: str = "avg",
        transfer_attributes: bool = True,
        keys: Optional[List[str]] = None,
    ):
        keys = keys or ["dom_x", "dom_y", "dom_z", "rde", "pmt_area"]
        super().__init__(keys, reduce, transfer_attributes)


class CustomDOMCoarsening(DOMCoarsening):
    """DOM clustering + min/max/std time & charge + pulse count
    (reference ``:245-277``)."""

    def _additional_features(
        self, cluster: np.ndarray, event: Event
    ) -> np.ndarray:
        ix_time = event.features.index("dom_time")
        ix_charge = event.features.index("charge")
        n = int(cluster.max()) + 1 if len(cluster) else 0
        time = event.x[:, ix_time]
        charge = event.x[:, ix_charge]
        cols = [
            _segment_reduce(time, cluster, n, np.min),
            _segment_reduce(time, cluster, n, np.max),
            _segment_reduce(time, cluster, n, np.std),
            _segment_reduce(charge, cluster, n, np.min),
            _segment_reduce(charge, cluster, n, np.max),
            _segment_reduce(charge, cluster, n, np.std),
            np.bincount(cluster, minlength=n).astype(np.float32),
        ]
        return np.stack(cols, axis=1)


class DOMAndTimeWindowCoarsening(Coarsening):
    """DOM clustering + DBSCAN time-window sub-clustering
    (reference ``:280-327``)."""

    def __init__(
        self,
        time_window: float,
        reduce: str = "avg",
        transfer_attributes: bool = True,
        keys: Optional[List[str]] = None,
        time_key: str = "dom_time",
    ):
        super().__init__(reduce, transfer_attributes)
        self._time_window = time_window
        self._keys = keys or [
            "dom_x",
            "dom_y",
            "dom_z",
            "rde",
            "pmt_area",
        ]
        self._time_key = time_key

    def _perform_clustering(self, event: Event) -> np.ndarray:
        from sklearn.cluster import DBSCAN

        cols = [event.features.index(a) for a in self._keys]
        _, dom_index = np.unique(
            event.x[:, cols], axis=0, return_inverse=True
        )
        ix_time = event.features.index(self._time_key)
        hit_times = event.x[:, ix_time]
        # scale dom ids so DBSCAN in 2D never merges across DOMs
        pts = np.stack(
            [hit_times, dom_index * self._time_window * 10.0], axis=1
        )
        return DBSCAN(self._time_window, min_samples=1).fit_predict(pts)
