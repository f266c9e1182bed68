"""SQLite-backed dataset (mirror of reference
``src/graphnet/data/dataset/sqlite/sqlite_dataset.py:11-153``).

Per-worker lazy connections; connections are closed after init so forked
dataloader workers open their own (the reference's pre-fork close pattern,
``:133-153``).
"""

from __future__ import annotations

import sqlite3
from typing import Any, Dict, List, Optional, Union

import numpy as np

from graphnet_tpu.data.dataset import ColumnMissingException, Dataset


class SQLiteDataset(Dataset):
    """Dataset reading events from one or more SQLite databases."""

    def _init(self) -> None:
        if isinstance(self._path, list):
            self._database_list: Optional[List[str]] = self._path
            self._all_connections: List[sqlite3.Connection] = []
            self._all_connections_established = False
            self._current_database: Optional[int] = None
        else:
            self._database_list = None
            assert isinstance(self._path, str)
            assert self._path.endswith(".db"), (
                f"Unsupported file format: {self._path}"
            )
        self._conn: Optional[sqlite3.Connection] = None

    def _post_init(self) -> None:
        self._remove_missing_columns()
        self._close_connection()

    def _remove_missing_columns(self) -> None:
        """Drop requested feature/truth columns absent from the file
        (reference ``dataset.py:475-511``)."""
        if len(self) == 0:
            return
        missing_features = set(self._features)
        for pulsemap in self._pulsemaps:
            missing = set()
            for col in list(self._features):
                try:
                    self.query_table(pulsemap, [col], 0)
                except ColumnMissingException:
                    missing.add(col)
            missing_features &= missing
        for col in missing_features:
            self._features.remove(col)
        for col in list(self._truth):
            try:
                self.query_table(self._truth_table, [col], 0)
            except ColumnMissingException:
                self._truth.remove(col)

    def query_table(
        self,
        table: str,
        columns: Union[List[str], str],
        sequential_index: Optional[int] = None,
        selection: Optional[str] = None,
    ) -> np.ndarray:
        if isinstance(columns, list):
            columns = ", ".join(columns)
        if not selection:
            selection = "1=1"
        index = self._get_event_index(sequential_index)
        self._establish_connection(
            sequential_index if sequential_index is not None else 0
        )
        try:
            assert self._conn is not None
            if sequential_index is None:
                combined = selection
            else:
                combined = f"{self._index_column} = {index} and {selection}"
            result = self._conn.execute(
                f"SELECT {columns} FROM {table} WHERE {combined}"
            ).fetchall()
        except sqlite3.OperationalError as e:
            if "no such column" in str(e):
                raise ColumnMissingException(str(e))
            raise
        return np.asarray(result)

    def _get_all_indices(self) -> List[int]:
        self._establish_connection(0)
        assert self._conn is not None
        rows = self._conn.execute(
            f"SELECT {self._index_column} FROM {self._truth_table}"
        ).fetchall()
        self._close_connection()
        return [r[0] for r in rows]

    def _get_event_index(self, sequential_index: Optional[int]) -> int:
        if sequential_index is None:
            return 0
        idx = self._indices[sequential_index]
        if self._database_list is not None and isinstance(
            idx, (list, tuple)
        ):
            return int(idx[0])
        return int(idx)

    def _establish_connection(self, i: int) -> None:
        if self._database_list is None:
            if self._conn is None:
                self._conn = sqlite3.connect(self._path)
            return
        idx = self._indices[i]
        assert isinstance(idx, (list, tuple)), (
            "multi-database selections must be (event_no, db_index) pairs"
        )
        if not self._all_connections_established:
            self._all_connections = [
                sqlite3.connect(db) for db in self._database_list
            ]
            self._all_connections_established = True
        if self._conn is None or idx[1] != self._current_database:
            self._conn = self._all_connections[idx[1]]
            self._current_database = idx[1]

    def event_lengths(self) -> List[int]:
        """Pulse count per event (for length-matched batching) via one
        GROUP BY query per pulsemap instead of N per-event queries."""
        if self._database_list is not None:
            # multi-database: fall back to per-event queries
            return [
                sum(
                    len(self.query_table(pm, [self._index_column], i))
                    for pm in self._pulsemaps
                )
                for i in range(len(self))
            ]
        self._establish_connection(0)
        assert self._conn is not None
        counts: Dict[int, int] = {}
        for pm in self._pulsemaps:
            rows = self._conn.execute(
                f"SELECT {self._index_column}, COUNT(*) FROM {pm} "
                f"GROUP BY {self._index_column}"
            ).fetchall()
            for event_no, n in rows:
                counts[event_no] = counts.get(event_no, 0) + n
        self._close_connection()
        return [counts.get(int(i), 0) for i in self._indices]

    def _close_connection(self) -> None:
        if self._conn is not None:
            if self._database_list is None:
                self._conn.close()
            self._conn = None
        if self._database_list is not None and (
            self._all_connections_established
        ):
            for con in self._all_connections:
                con.close()
            self._all_connections = []
            self._all_connections_established = False
            self._current_database = None
