"""LiquidO detector definition (mirror of reference
``src/graphnet/models/detector/liquido.py:11-46``)."""

from graphnet_tpu.constants import LIQUIDO_GEOMETRY_TABLE_DIR
from graphnet_tpu.models.detector.detector import affine, make_detector

LiquidO_v1 = make_detector(
    "LiquidO_v1",
    LIQUIDO_GEOMETRY_TABLE_DIR,
    "liquido_v1.parquet",
    xyz=["sipm_x", "sipm_y", "sipm_z"],
    string_id="fiber_id",
    sensor_id="sipm_id",
    fmap={
        "sipm_x": affine(1000.0),
        "sipm_y": affine(1000.0),
        "sipm_z": affine(1000.0),
        "t": affine(500.0),
    },
)
