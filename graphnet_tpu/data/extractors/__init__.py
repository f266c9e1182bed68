"""Extractors: pull tables of columns out of raw experiment files."""

from graphnet_tpu.data.extractors.extractor import Extractor
from graphnet_tpu.data.extractors.prometheus import (
    PrometheusExtractor,
    PrometheusFeatureExtractor,
    PrometheusTruthExtractor,
)
from graphnet_tpu.data.extractors.liquido import (
    H5Extractor,
    H5HitExtractor,
    H5TruthExtractor,
)
from graphnet_tpu.data.extractors.internal import ParquetExtractor
