"""Curated public datasets."""

from graphnet_tpu.datasets.prometheus_datasets import (
    PublicPrometheusDataset,
    TRIDENTSmall,
    PONESmall,
    BaikalGVDSmall,
)
from graphnet_tpu.datasets.test_dataset import TestDataset
