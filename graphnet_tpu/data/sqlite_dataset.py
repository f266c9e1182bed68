"""SQLite-backed dataset (mirror of reference
``src/graphnet/data/dataset/sqlite/sqlite_dataset.py:11-153``).

Per-worker lazy connections, held in thread-local storage so prefetch
threads (``data/prefetch.py``) and ``DataLoader(num_workers=N)`` pool
threads each open their own (sqlite3 connections are thread-bound);
connections are closed after init so forked dataloader workers open
their own too (the reference's pre-fork close pattern, ``:133-153``).
"""

from __future__ import annotations

import sqlite3
import threading
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from graphnet_tpu.data.dataset import ColumnMissingException, Dataset


class SQLiteDataset(Dataset):
    """Dataset reading events from one or more SQLite databases."""

    def _init(self) -> None:
        if isinstance(self._path, list):
            self._database_list: Optional[List[str]] = self._path
        else:
            self._database_list = None
            assert isinstance(self._path, str)
            assert self._path.endswith(".db"), (
                f"Unsupported file format: {self._path}"
            )

    # -- per-thread connection state ------------------------------------
    @property
    def _tls(self) -> threading.local:
        tls = self.__dict__.get("_tls_store")
        if tls is None:
            tls = threading.local()
            self.__dict__["_tls_store"] = tls
        return tls

    @property
    def _conn(self) -> Optional[sqlite3.Connection]:
        return getattr(self._tls, "conn", None)

    @_conn.setter
    def _conn(self, value) -> None:
        self._tls.conn = value

    def __getstate__(self):
        # thread-locals (and their connections) cannot cross a process
        # boundary — drop them; the worker re-opens lazily
        state = dict(self.__dict__)
        state.pop("_tls_store", None)
        return state

    def _native_handle(self) -> Optional[int]:
        """Per-thread native SQLite handle (``native/sqlite_fetch.cpp``)
        for the batched fetch; None when unavailable (multi-database
        configurations, no compiler)."""
        tls = self._tls
        h = getattr(tls, "native_handle", None)
        if h is False:
            return None
        if h is None:
            if self._database_list is not None or not isinstance(
                self._path, str
            ):
                tls.native_handle = False
                return None
            from graphnet_tpu.native import sqlite_open

            h = sqlite_open(self._path)
            tls.native_handle = h if h else False
            if not h:
                return None
        return h

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
        tls = self._tls
        if self._database_list is None:
            if self._conn is None:
                self._conn = sqlite3.connect(self._path)
            return
        idx = self._indices[i]
        assert isinstance(idx, (list, tuple)), (
            "multi-database selections must be (event_no, db_index) pairs"
        )
        if not getattr(tls, "all_established", False):
            tls.all_connections = [
                sqlite3.connect(db) for db in self._database_list
            ]
            tls.all_established = True
            tls.current_database = None
        if self._conn is None or idx[1] != tls.current_database:
            self._conn = tls.all_connections[idx[1]]
            tls.current_database = idx[1]

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
        """Close the *calling thread's* connections."""
        tls = self._tls
        h = getattr(tls, "native_handle", None)
        if h:
            from graphnet_tpu.native import sqlite_close

            sqlite_close(h)
            tls.native_handle = None
        if self._conn is not None:
            if self._database_list is None:
                self._conn.close()
            self._conn = None
        if self._database_list is not None and getattr(
            tls, "all_established", False
        ):
            for con in tls.all_connections:
                con.close()
            tls.all_connections = []
            tls.all_established = False
            tls.current_database = None

    # -- batched fetch ---------------------------------------------------
    def _query_batch(
        self,
        table: str,
        columns: List[str],
        event_nos: List[int],
        selection: Optional[str] = None,
    ) -> Dict[int, np.ndarray]:
        """One ``WHERE event_no IN (...)`` query, grouped by event with
        numpy (stable argsort — within-event row order matches the
        per-event query, both following table scan order)."""
        cols = ", ".join(columns)
        sel = f" and {selection}" if selection else ""
        in_list = ",".join(str(int(e)) for e in event_nos)
        sql = (
            f"SELECT {self._index_column}, {cols} FROM {table} "
            f"WHERE {self._index_column} IN ({in_list}){sel}"
        )
        # native route: SQLite C API straight into a float64 buffer, no
        # Python row tuples, GIL released (native/sqlite_fetch.cpp)
        arr = None
        handle = self._native_handle()
        if handle is not None:
            from graphnet_tpu.native import sqlite_fetch_f64

            arr = sqlite_fetch_f64(
                handle,
                sql,
                len(columns) + 1,
                cap_hint=max(4096, 128 * len(event_nos)),
            )
        if arr is None:
            try:
                rows = self._conn.execute(sql).fetchall()
            except sqlite3.OperationalError as e:
                if "no such column" in str(e):
                    raise ColumnMissingException(str(e))
                raise
            # NULL/TEXT cells cannot take the numeric fast path
            # (the caller falls back to per-event queries, whose object
            # arrays GraphDefinition already tolerates)
            arr = (
                np.asarray(rows, dtype=np.float64)
                if rows
                else np.zeros((0, len(columns) + 1))
            )
        grouped: Dict[int, np.ndarray] = {}
        if len(arr):
            order = np.argsort(arr[:, 0], kind="stable")
            arr = arr[order]
            ev = arr[:, 0]
            uniq, starts = np.unique(ev, return_index=True)
            bounds = list(starts) + [len(ev)]
            for u, s, t in zip(uniq, bounds[:-1], bounds[1:]):
                grouped[int(u)] = arr[s:t, 1:]
        empty = np.zeros((0, len(columns)))
        for e in event_nos:
            grouped.setdefault(int(e), empty)
        return grouped

    def get_batch_arrays(
        self, sequential_indices: List[int]
    ) -> Optional[Tuple[List[np.ndarray], np.ndarray]]:
        """Raw arrays for a whole batch in two SQL queries: per-event
        ``[n_i, n_features]`` float64 feature arrays plus a
        ``[B, n_truth]`` truth matrix (index column first, matching
        ``self._truth``).

        The fully-vectorised input path: the DataLoader standardises the
        *concatenated* pulses in one detector pass and builds batch
        labels as column views of the truth matrix
        (``dataloader.py:collate_from_arrays``) — no per-event Python
        dicts.  Returns None for configurations the batched path doesn't
        carry (multi-database, node truth, loss weights, NULL/TEXT
        cells), where callers fall back to :meth:`get_events`.
        """
        if (
            self._database_list is not None
            or self._node_truth
            or self._loss_weight_column is not None
            or not sequential_indices
        ):
            return None
        self._establish_connection(sequential_indices[0])
        event_nos = [
            self._get_event_index(i) for i in sequential_indices
        ]
        try:
            feature_groups = [
                self._query_batch(
                    pm, self._features, event_nos, self._selection
                )
                for pm in self._pulsemaps
            ]
            truth_group = self._query_batch(
                self._truth_table, self._truth[1:], event_nos
            )
        except (TypeError, ValueError):
            return None
        features_list = []
        truth_mat = np.zeros(
            (len(event_nos), len(self._truth)), dtype=np.float64
        )
        for j, e in enumerate(event_nos):
            feats = [g[e] for g in feature_groups if len(g[e])]
            features_list.append(
                np.concatenate(feats, axis=0)
                if feats
                else np.zeros((0, len(self._features)))
            )
            truth_rows = truth_group[e]
            if len(truth_rows):
                truth_mat[j, 0] = float(e)
                truth_mat[j, 1:] = truth_rows[0]
        return features_list, truth_mat

    def get_events(self, sequential_indices: List[int]) -> List[Event]:
        """Batched fetch: one SQL query per table per batch instead of one
        per event — the host-pipeline fast path used by the DataLoader.

        Falls back to per-event queries for the configurations where the
        per-event path carries extra context (multi-database selections,
        node-level truth, loss-weight tables)."""
        if (
            self._database_list is not None
            or self._node_truth
            or self._loss_weight_column is not None
            or not sequential_indices
        ):
            return [self[i] for i in sequential_indices]
        self._establish_connection(sequential_indices[0])
        event_nos = [
            self._get_event_index(i) for i in sequential_indices
        ]
        try:
            feature_groups = [
                self._query_batch(
                    pm, self._features, event_nos, self._selection
                )
                for pm in self._pulsemaps
            ]
            # self._truth already leads with the index column; group on it
            truth_group = self._query_batch(
                self._truth_table, self._truth[1:], event_nos
            )
        except (TypeError, ValueError):
            # NULL or TEXT cells in a table: per-event path handles them
            # (object arrays; GraphDefinition skips str/None truth)
            return [self[i] for i in sequential_indices]
        events = []
        for e in event_nos:
            feats = [g[e] for g in feature_groups if len(g[e])]
            features = (
                np.concatenate(feats, axis=0)
                if feats
                else np.zeros((0, len(self._features)))
            )
            truth_rows = truth_group[e]
            if len(truth_rows):
                truth = np.concatenate(
                    [[float(e)], truth_rows[0]]
                ).reshape(1, -1)
            else:
                truth = np.zeros((1, len(self._truth)))
            events.append(self._create_graph(features, truth))
        return events
