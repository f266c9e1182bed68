"""Public SQLite helpers mirroring the reference's
``data/utilities/sqlite_utilities.py:11-206``: small standalone functions
users call directly (notebooks, selection building, weight tables) on the
intermediate-format databases.  ``create_table``/``save_to_sql`` live in
``graphnet_tpu.data.writers.sqlite_writer`` and are re-exported here."""

from __future__ import annotations

import os
import sqlite3
from typing import Any, List

import pandas as pd

from graphnet_tpu.data.writers.sqlite_writer import (  # noqa: F401
    create_table,
    save_to_sql,
)


def database_exists(database_path: str) -> bool:
    """True if ``database_path`` points at an existing ``.db`` file."""
    if not database_path.endswith(".db"):
        raise ValueError(
            f"expected a .db path, got {database_path!r}"
        )
    return os.path.exists(database_path)


def run_sql_code(database_path: str, code: str) -> None:
    """Execute an arbitrary SQL script against the database."""
    with sqlite3.connect(database_path) as conn:
        conn.executescript(code)


def database_table_exists(database_path: str, table_name: str) -> bool:
    """True if ``table_name`` exists in the database."""
    if not database_exists(database_path):
        return False
    with sqlite3.connect(database_path) as conn:
        rows = conn.execute(
            "SELECT name FROM sqlite_master "
            "WHERE type='table' AND name=?",
            (table_name,),
        ).fetchall()
    return len(rows) > 0


def query_database(database_path: str, query: str) -> pd.DataFrame:
    """Run a SELECT and return the result as a DataFrame."""
    with sqlite3.connect(database_path) as conn:
        return pd.read_sql(query, conn)


def get_primary_keys(database_path: str) -> tuple:
    """Per-table primary-key map plus the shared key name.

    Returns ``(keys, key_name)`` where ``keys`` maps each table to its
    integer primary-key column (or None), and ``key_name`` is the single
    distinct non-null key name (the event index, e.g. ``event_no``).
    """
    with sqlite3.connect(database_path) as conn:
        tables = [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        ]
        keys = {}
        for table in tables:
            pk = [
                r[1]
                for r in conn.execute(f"PRAGMA table_info({table})")
                if r[5]  # pk flag
            ]
            keys[table] = pk[0] if pk else None
    names = {k for k in keys.values() if k is not None}
    if len(names) > 1:
        raise ValueError(
            f"multiple distinct primary keys across tables: {names}"
        )
    return keys, (names.pop() if names else None)


def attach_index(
    database_path: str, table_name: str, index_column: str = "event_no"
) -> None:
    """Attach a (named) index on ``index_column`` to an existing table."""
    code = (
        "PRAGMA foreign_keys=off;\n"
        "BEGIN TRANSACTION;\n"
        f"CREATE INDEX IF NOT EXISTS {index_column}_{table_name} "
        f"ON {table_name} ({index_column});\n"
        "COMMIT TRANSACTION;\n"
        "PRAGMA foreign_keys=on;"
    )
    run_sql_code(database_path, code)


def get_all_tables(database_path: str) -> List[str]:
    """All table names in the database."""
    with sqlite3.connect(database_path) as conn:
        return [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        ]


def get_event_numbers(
    database_path: str, table: str, index_column: str = "event_no"
) -> List[Any]:
    """Distinct event ids present in ``table``."""
    with sqlite3.connect(database_path) as conn:
        return [
            r[0]
            for r in conn.execute(
                f"SELECT DISTINCT {index_column} FROM {table}"
            )
        ]
