"""Chunk-based Parquet dataset (mirror of reference
``src/graphnet/data/dataset/parquet/parquet_dataset.py``).

Layout produced by ``ParquetWriter``: one directory per table, one file per
chunk of N events (``<table>/<table>_<chunk>.parquet``).  A selection is a
list of chunk ids; random access maps a sequential index to (chunk, row)
through cumulative chunk sizes (reference ``:197-216``), with an LRU cache
of decoded chunks (``:139-156``).  Implemented with pyarrow/pandas (the
reference uses polars, unavailable here).
"""

from __future__ import annotations

import os
from bisect import bisect_right
from collections import OrderedDict
from glob import glob
from typing import Dict, List, Optional, Union

import numpy as np

from graphnet_tpu.data.dataset import ColumnMissingException, Dataset


class ParquetDataset(Dataset):
    """Dataset over ParquetWriter-style chunked directories."""

    def __init__(self, *args, cache_size: int = 1, **kwargs):
        self._cache_size = max(cache_size, 1)
        super().__init__(*args, **kwargs)
        assert isinstance(self._path, str)
        if any(isinstance(i, str) for i in self._indices):
            raise ValueError("ParquetDataset does not support str selections")
        self._chunk_sizes = self._calculate_sizes()
        self._chunk_cumsum = np.cumsum(self._chunk_sizes)
        self._file_cache: Dict[str, OrderedDict] = {}
        self._remove_missing_columns()

    # --- base-class hooks ---------------------------------------------------
    def _init(self) -> None:
        self._file_cache = {}

    def _get_all_indices(self) -> List[int]:
        files = glob(
            os.path.join(self._path, self._truth_table, "*.parquet")
        )
        return list(range(len(files)))

    def _get_event_index(self, sequential_index: Optional[int]) -> int:
        res = self.query_table(
            self._truth_table, [self._index_column], sequential_index
        )
        return int(np.asarray(res).reshape(-1)[0])

    def __len__(self) -> int:
        return int(sum(self._chunk_sizes))

    @property
    def chunk_sizes(self) -> List[int]:
        return self._chunk_sizes

    # --- chunk bookkeeping --------------------------------------------------
    def _chunk_path(self, table: str, chunk_id: int) -> str:
        return os.path.join(
            self._path, table, f"{table}_{chunk_id}.parquet"
        )

    def _calculate_sizes(self) -> List[int]:
        import pyarrow.parquet as pq

        return [
            pq.ParquetFile(
                self._chunk_path(self._truth_table, cid)
            ).metadata.num_rows
            for cid in self._indices
        ]

    def _get_row_idx(self, sequential_index: int) -> int:
        file_idx = bisect_right(self._chunk_cumsum, sequential_index)
        if file_idx > 0:
            return int(
                sequential_index - self._chunk_cumsum[file_idx - 1]
            )
        return sequential_index

    def _load_table(self, table: str, chunk_id: int):
        """Load a chunk as (sorted event_nos, per-event arrays dict or
        truth DataFrame), LRU-cached."""
        import pandas as pd

        cache = self._file_cache.setdefault(table, OrderedDict())
        if chunk_id in cache:
            cache.move_to_end(chunk_id)
            return cache[chunk_id]
        df = pd.read_parquet(self._chunk_path(table, chunk_id))
        if self._index_column == df.index.name:
            df = df.reset_index()
        df = df.sort_values(self._index_column, kind="stable")
        is_pulse_level = table in self._pulsemaps or (
            table == self._node_truth_table
        )
        if is_pulse_level:
            groups = {
                k: v for k, v in df.groupby(self._index_column, sort=True)
            }
            entry = ("pulse", sorted(groups), groups)
        else:
            entry = ("event", df[self._index_column].to_numpy(), df)
        cache[chunk_id] = entry
        while len(cache) > self._cache_size:
            cache.popitem(last=False)
        return entry

    # --- queries ------------------------------------------------------------
    def query_table(
        self,
        table: str,
        columns: Union[List[str], str],
        sequential_index: Optional[int] = None,
        selection: Optional[str] = None,
    ) -> np.ndarray:
        if isinstance(columns, str):
            columns = [columns]
        if sequential_index is None:
            file_ids = list(range(len(self._chunk_cumsum)))
        else:
            file_ids = [
                bisect_right(self._chunk_cumsum, sequential_index)
            ]
        arrays = []
        for fid in file_ids:
            chunk_id = self._indices[fid]
            kind, keys, data = self._load_table(table, chunk_id)
            if sequential_index is not None:
                row = self._get_row_idx(sequential_index)
                if kind == "pulse":
                    # the truth table defines event order within a chunk
                    _, truth_keys, _ = self._load_table(
                        self._truth_table, chunk_id
                    )
                    event_no = truth_keys[row]
                    group = data.get(event_no)
                    if group is None:
                        arrays.append(
                            np.zeros((0, len(columns)), np.float64)
                        )
                        continue
                    self._check_columns(group.columns, columns, table)
                    arrays.append(group[columns].to_numpy())
                else:
                    self._check_columns(data.columns, columns, table)
                    arrays.append(
                        data.iloc[[row]][columns].to_numpy()
                    )
            else:
                if kind == "pulse":
                    parts = [
                        g[columns].to_numpy()
                        for _, g in sorted(data.items())
                    ]
                    arrays.append(
                        np.concatenate(parts, axis=0)
                        if parts
                        else np.zeros((0, len(columns)))
                    )
                else:
                    self._check_columns(data.columns, columns, table)
                    arrays.append(data[columns].to_numpy())
        return np.concatenate(arrays, axis=0)

    def _check_columns(self, df_columns, columns, table) -> None:
        for c in columns:
            if c not in df_columns:
                raise ColumnMissingException(f"{c} not in {table}")

    def _remove_missing_columns(self) -> None:
        if len(self) == 0:
            return
        for col in list(self._features):
            try:
                for pm in self._pulsemaps:
                    self.query_table(pm, [col], 0)
            except ColumnMissingException:
                self._features.remove(col)
        for col in list(self._truth):
            try:
                self.query_table(self._truth_table, [col], 0)
            except ColumnMissingException:
                self._truth.remove(col)

    def event_lengths(self) -> List[int]:
        """Pulse count per event across all chunks (for bucketed batching)."""
        lengths: List[int] = []
        for fid, chunk_id in enumerate(self._indices):
            _, truth_keys, _ = self._load_table(
                self._truth_table, chunk_id
            )
            counts: Dict[int, int] = {}
            for pm in self._pulsemaps:
                _, _, groups = self._load_table(pm, chunk_id)
                for k, g in groups.items():
                    counts[k] = counts.get(k, 0) + len(g)
            lengths.extend(
                counts.get(int(k), 0) for k in truth_keys
            )
        return lengths
