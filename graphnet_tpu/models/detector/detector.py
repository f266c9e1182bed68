"""Detector definitions: per-feature standardization + geometry tables.

Mirror of the reference ``src/graphnet/models/detector/`` package
(``detector.py:14-81`` for the base contract).  Standardization runs
host-side on numpy event arrays (it is part of the input pipeline, not the
jitted model), and is expressed as affine/log scalings per column.  Instead
of one near-identical class per geometry, scalings are table-driven: a
``Scaling`` is ``(kind, params)`` and a detector is a mapping
``column -> Scaling`` plus geometry metadata.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from graphnet_tpu.constants import (
    ICECUBE_GEOMETRY_TABLE_DIR,
    LIQUIDO_GEOMETRY_TABLE_DIR,
    PROMETHEUS_GEOMETRY_TABLE_DIR,
)


def affine(scale: float, offset: float = 0.0) -> Callable:
    """x -> (x + offset) / scale."""

    def fn(x: np.ndarray) -> np.ndarray:
        return (x + offset) / scale

    fn.kind = ("affine", scale, offset)  # type: ignore[attr-defined]
    return fn


def log10_scale(scale: float = 1.0) -> Callable:
    """x -> log10(x) / scale."""

    def fn(x: np.ndarray) -> np.ndarray:
        return np.log10(x) / scale

    fn.kind = ("log10", scale)  # type: ignore[attr-defined]
    return fn


def identity() -> Callable:
    def fn(x: np.ndarray) -> np.ndarray:
        return x

    fn.kind = ("identity",)  # type: ignore[attr-defined]
    return fn


def mul_offset(scale: float, offset: float) -> Callable:
    """x -> x/scale + offset (DeepCore time: (x/1.05e4 - 1) * 20)."""

    def fn(x: np.ndarray) -> np.ndarray:
        return (x / scale + offset)

    fn.kind = ("mul_offset", scale, offset)  # type: ignore[attr-defined]
    return fn


def scaled_shift(scale: float, offset: float, post: float) -> Callable:
    """x -> (x/scale + offset) * post."""

    def fn(x: np.ndarray) -> np.ndarray:
        return (x / scale + offset) * post

    fn.kind = ("scaled_shift", scale, offset, post)  # type: ignore


    return fn


class Detector:
    """Base detector: ``feature_map`` of per-column scalings + geometry.

    Subclasses (or instances of :func:`make_detector`) set ``_feature_map``,
    ``xyz``, ``string_id_column``, ``sensor_id_column`` and
    ``geometry_table_path``.
    """

    xyz: List[str] = []
    string_id_column: str = ""
    sensor_id_column: str = ""
    geometry_table_path: str = ""
    _feature_map: Dict[str, Callable] = {}

    def feature_map(self) -> Dict[str, Callable]:
        return self._feature_map

    @property
    def geometry_table(self):
        """Lazily-loaded geometry table (pandas DataFrame)."""
        if not hasattr(self, "_geometry_table"):
            import pandas as pd

            assert self.geometry_table_path, (
                f"{type(self).__name__} has no geometry_table_path"
            )
            self._geometry_table = pd.read_parquet(self.geometry_table_path)
        return self._geometry_table

    @property
    def string_index_name(self) -> str:
        return self.string_id_column

    @property
    def sensor_position_names(self) -> List[str]:
        return self.xyz

    @property
    def sensor_index_name(self) -> str:
        return self.sensor_id_column

    def __call__(
        self, features: np.ndarray, feature_names: List[str]
    ) -> np.ndarray:
        """Standardize columns in-place-free (reference ``detector.py:64-77``).

        Raises KeyError for columns with no registered scaling, matching the
        reference's strictness.
        """
        fmap = self.feature_map()
        out = np.array(features, dtype=np.float32, copy=True)
        for i, name in enumerate(feature_names):
            if name not in fmap:
                raise KeyError(
                    f"No standardization function for feature {name!r} in "
                    f"{type(self).__name__}"
                )
            out[:, i] = fmap[name](out[:, i])
        return out


_DETECTOR_REGISTRY: Dict[str, type] = {}


def make_detector(
    name: str,
    geometry_dir: str,
    geometry_file: str,
    xyz: List[str],
    string_id: str,
    sensor_id: str,
    fmap: Dict[str, Callable],
    doc: str = "",
) -> type:
    """Create and register a Detector subclass from a scaling table."""
    cls = type(
        name,
        (Detector,),
        {
            "geometry_table_path": os.path.join(geometry_dir, geometry_file),
            "xyz": xyz,
            "string_id_column": string_id,
            "sensor_id_column": sensor_id,
            "_feature_map": fmap,
            "__doc__": doc or f"Detector definition for {name}.",
        },
    )
    _DETECTOR_REGISTRY[name] = cls
    return cls


def get_detector(name: str) -> Detector:
    return _DETECTOR_REGISTRY[name]()


def available_detectors() -> List[str]:
    return sorted(_DETECTOR_REGISTRY)
