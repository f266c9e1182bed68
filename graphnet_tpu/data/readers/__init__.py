"""File readers for raw experiment formats."""

from graphnet_tpu.data.readers.reader import GraphNeTFileReader
from graphnet_tpu.data.readers.prometheus_reader import PrometheusReader
from graphnet_tpu.data.readers.liquido_reader import LiquidOReader
from graphnet_tpu.data.readers.internal_parquet_reader import ParquetReader
