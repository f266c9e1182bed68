"""Pre-configured converters (mirror of reference
``src/graphnet/data/pre_configured/dataconverters.py``).

The IceTray-based converters (I3To*) require the proprietary icecube
software stack and are available only when it is installed (reference
guards them the same way, ``utilities/imports.py:9-21``).
"""

from __future__ import annotations

from typing import List, Optional, Union

from graphnet_tpu.data.dataconverter import DataConverter
from graphnet_tpu.data.extractors.internal import ParquetExtractor
from graphnet_tpu.data.readers.internal_parquet_reader import ParquetReader
from graphnet_tpu.data.writers.sqlite_writer import SQLiteWriter


class ParquetToSQLiteConverter(DataConverter):
    """Convert the framework's merged-parquet format to SQLite."""

    def __init__(
        self,
        parquet_path: str,
        sqlite_path: str,
        tables: List[str],
        num_workers: int = 1,
        index_column: str = "event_no",
    ):
        super().__init__(
            file_reader=ParquetReader(),
            save_method=SQLiteWriter(),
            outdir=sqlite_path,
            extractors=[ParquetExtractor(t) for t in tables],
            index_column=index_column,
            num_workers=num_workers,
        )
        self._parquet_path = parquet_path

    def run(self) -> None:
        self(self._parquet_path)
        self.merge_files()
