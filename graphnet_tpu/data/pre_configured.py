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
from graphnet_tpu.data.writers.parquet_writer import ParquetWriter
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


class _I3Converter(DataConverter):
    """Shared construction for the I3To* converters (reference
    ``pre_configured/dataconverters.py:13-110``)."""

    _writer_cls: type

    def __init__(
        self,
        gcd_rescue: str,
        extractors: list,
        outdir: str,
        index_column: str = "event_no",
        num_workers: int = 1,
        i3_filters=None,
    ):
        from graphnet_tpu.data.readers.i3reader import I3Reader

        super().__init__(
            file_reader=I3Reader(
                gcd_rescue=gcd_rescue, i3_filters=i3_filters
            ),
            save_method=self._writer_cls(),
            outdir=outdir,
            extractors=extractors,
            index_column=index_column,
            num_workers=num_workers,
        )


class I3ToSQLiteConverter(_I3Converter):
    """I3 files → SQLite intermediate format (requires IceTray at runtime;
    reference ``pre_configured/dataconverters.py:58``)."""

    _writer_cls = SQLiteWriter


class I3ToParquetConverter(_I3Converter):
    """I3 files → chunked-parquet intermediate format (requires IceTray at
    runtime; reference ``pre_configured/dataconverters.py:13``)."""

    _writer_cls = ParquetWriter
