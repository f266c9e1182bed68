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
        import os

        import pandas as pd

        base = os.path.basename(file_path)
        if (
            self._table not in file_path.split("/")
            and not base.startswith(self._table + "_")
        ):
            return None
        df = pd.read_parquet(file_path)
        # chunked-parquet tables index rows by event id
        # (``data/writers/parquet_writer.py``); downstream consumers
        # (SQLite conversion) expect it as a column
        if df.index.name is not None:
            df = df.reset_index()
        return df
