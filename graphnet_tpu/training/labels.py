"""Runtime truth labels (mirror of reference
``src/graphnet/training/labels.py``), computed host-side on Event records."""

from __future__ import annotations

import numpy as np

from graphnet_tpu.utils.config import save_config


class Label:
    """Base label: callable on an Event, stored under ``key``
    (reference ``labels.py:9-31``)."""

    @save_config
    def __init__(self, key: str):
        self._key = key

    @property
    def key(self) -> str:
        return self._key

    def __call__(self, event) -> np.ndarray:
        raise NotImplementedError

    # Optional: subclasses may implement ``batched(labels)`` computing the
    # label for a whole batch from ``[B]`` label columns — the vectorised
    # input path (``dataloader.py:collate_from_arrays``) requires it and
    # falls back to the per-event route when absent.


class Direction(Label):
    """Unit 3-vector from azimuth/zenith (reference ``labels.py:34-70``)."""

    @save_config
    def __init__(
        self,
        key: str = "direction",
        azimuth_key: str = "azimuth",
        zenith_key: str = "zenith",
    ):
        super().__init__(key=key)
        self._azimuth_key = azimuth_key
        self._zenith_key = zenith_key

    def __call__(self, event) -> np.ndarray:
        az = np.asarray(event.labels[self._azimuth_key], np.float64).reshape(
            -1
        )
        ze = np.asarray(event.labels[self._zenith_key], np.float64).reshape(
            -1
        )
        x = np.cos(az) * np.sin(ze)
        y = np.sin(az) * np.sin(ze)
        z = np.cos(ze)
        return np.stack([x, y, z], axis=-1).astype(np.float32).squeeze(0)

    def batched(self, labels: dict) -> np.ndarray:
        """[B, 3] unit vectors from [B] azimuth/zenith columns."""
        az = np.asarray(labels[self._azimuth_key], np.float64)
        ze = np.asarray(labels[self._zenith_key], np.float64)
        return np.stack(
            [
                np.cos(az) * np.sin(ze),
                np.sin(az) * np.sin(ze),
                np.cos(ze),
            ],
            axis=-1,
        ).astype(np.float32)


class Track(Label):
    """1 iff NuMu CC (reference ``labels.py:73-107``)."""

    @save_config
    def __init__(
        self,
        key: str = "track",
        pid_key: str = "pid",
        interaction_key: str = "interaction_type",
    ):
        super().__init__(key=key)
        self._pid_key = pid_key
        self._int_key = interaction_key

    def __call__(self, event) -> np.ndarray:
        is_numu = np.abs(np.asarray(event.labels[self._pid_key])) == 14
        is_cc = np.asarray(event.labels[self._int_key]) == 1
        return np.asarray(is_numu & is_cc, np.int32)

    def batched(self, labels: dict) -> np.ndarray:
        is_numu = np.abs(np.asarray(labels[self._pid_key])) == 14
        is_cc = np.asarray(labels[self._int_key]) == 1
        return np.asarray(is_numu & is_cc, np.int32)
