"""Public sqlite helper functions (reference
``data/utilities/sqlite_utilities.py``)."""

import pandas as pd
import pytest

from graphnet_tpu.data.sqlite_utilities import (
    attach_index,
    database_exists,
    database_table_exists,
    get_all_tables,
    get_event_numbers,
    get_primary_keys,
    query_database,
    run_sql_code,
    save_to_sql,
)


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "events.db")
    truth = pd.DataFrame(
        {"event_no": [0, 1, 2], "energy": [1.0, 2.0, 3.0]}
    )
    pulses = pd.DataFrame(
        {"event_no": [0, 0, 1, 2, 2, 2], "charge": [1.0] * 6}
    )
    save_to_sql(truth, "truth", path, "event_no")
    save_to_sql(pulses, "pulses", path, "event_no")
    return path


def test_exists_and_tables(db, tmp_path):
    assert database_exists(db)
    assert not database_exists(str(tmp_path / "nope.db"))
    with pytest.raises(ValueError):
        database_exists(str(tmp_path / "not_a_db.txt"))
    assert set(get_all_tables(db)) == {"truth", "pulses"}
    assert database_table_exists(db, "truth")
    assert not database_table_exists(db, "missing")


def test_query_and_keys(db):
    df = query_database(db, "SELECT * FROM truth WHERE event_no > 0")
    assert list(df["event_no"]) == [1, 2]
    keys, name = get_primary_keys(db)
    assert name == "event_no"
    assert keys["truth"] == "event_no"
    # pulses table is many-rows-per-event: indexed, not a primary key
    assert keys["pulses"] is None
    assert get_event_numbers(db, "pulses") == [0, 1, 2]


def test_run_sql_and_attach_index(db):
    run_sql_code(
        db, "CREATE TABLE extra (event_no INTEGER, w FLOAT);"
    )
    assert database_table_exists(db, "extra")
    attach_index(db, "extra")
    idx = query_database(
        db,
        "SELECT name FROM sqlite_master WHERE type='index' "
        "AND tbl_name='extra'",
    )
    assert "event_no_extra" in set(idx["name"])
