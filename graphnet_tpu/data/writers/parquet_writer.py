"""Chunked Parquet writer (mirror of reference
``src/graphnet/data/writers/parquet_writer.py:16-229``).

``merge_files`` produces the layout consumed by
:class:`~graphnet_tpu.data.parquet_dataset.ParquetDataset`: a directory per
table with one file per chunk of ``events_per_batch`` events
(``<table>/<table>_<chunk>.parquet``), enabling chunk-level random access.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from graphnet_tpu.data.writers.writer import GraphNeTWriter


class ParquetWriter(GraphNeTWriter):
    _file_extension = ".parquet"
    _merge_dataframes = False  # receives {table: [per-event DataFrames]}

    def __init__(
        self,
        truth_table: str = "truth",
        index_column: str = "event_no",
    ):
        super().__init__()
        self._truth_table = truth_table
        self._index_column = index_column

    def _save_file(self, data, output_file_path: str, n_events: int):
        import pandas as pd

        # interim save: one parquet per input file with all tables merged
        # row-wise per table, written side by side
        base = output_file_path.replace(self._file_extension, "")
        for table, dfs in data.items():
            if isinstance(dfs, list):
                df = pd.concat(dfs, axis=0).reset_index(drop=True)
            else:
                df = dfs
            os.makedirs(os.path.dirname(base), exist_ok=True)
            # '__' separates the input-file stem from the table name so
            # merge_files can recover table names containing underscores
            df.to_parquet(f"{base}__{table}{self._file_extension}")

    def merge_files(
        self,
        files: List[str],
        output_dir: str,
        events_per_batch: int = 200000,
    ) -> None:
        import pandas as pd

        os.makedirs(output_dir, exist_ok=True)
        tables: Dict[str, List] = {}
        for f in files:
            df = pd.read_parquet(f)
            stem = os.path.basename(f).replace(self._file_extension, "")
            table = stem.split("__")[-1]
            tables.setdefault(table, []).append(df)

        truth_key = None
        for t in tables:
            if t in (self._truth_table, "mc_truth", "truth"):
                truth_key = t
        assert truth_key is not None, (
            f"no truth table among {list(tables)}"
        )
        merged = {
            t: pd.concat(dfs, axis=0).reset_index(drop=True)
            for t, dfs in tables.items()
        }
        event_nos = np.sort(
            pd.unique(merged[truth_key][self._index_column])
        )
        chunks = [
            event_nos[i : i + events_per_batch]
            for i in range(0, len(event_nos), events_per_batch)
        ]
        for table, df in merged.items():
            table_dir = os.path.join(output_dir, table)
            os.makedirs(table_dir, exist_ok=True)
            for ci, chunk_events in enumerate(chunks):
                sel = df[df[self._index_column].isin(chunk_events)]
                sel.to_parquet(
                    os.path.join(
                        table_dir,
                        f"{table}_{ci}{self._file_extension}",
                    )
                )
        self.info(
            f"Merged {len(files)} files into {output_dir} "
            f"({len(chunks)} chunk(s))"
        )
