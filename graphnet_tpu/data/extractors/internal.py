"""Extractor for the framework's own merged-parquet format (mirror of
reference ``src/graphnet/data/extractors/internal/parquet_extractor.py``)."""

from __future__ import annotations

from graphnet_tpu.data.extractors.extractor import Extractor


class ParquetExtractor(Extractor):
    """Re-extract a table from a GraphNeT-format parquet file."""

    def __init__(self, extractor_name: str):
        super().__init__(extractor_name=extractor_name)
        self._table = extractor_name

    def __call__(self, file_path: str):
        import pandas as pd

        if self._table in file_path.split("/"):
            return pd.read_parquet(file_path)
        import os

        base = os.path.basename(file_path)
        if base.startswith(self._table + "_"):
            return pd.read_parquet(file_path)
        return None
