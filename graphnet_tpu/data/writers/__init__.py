"""Writers for the intermediate formats."""

from graphnet_tpu.data.writers.writer import GraphNeTWriter
from graphnet_tpu.data.writers.sqlite_writer import SQLiteWriter
from graphnet_tpu.data.writers.parquet_writer import ParquetWriter
