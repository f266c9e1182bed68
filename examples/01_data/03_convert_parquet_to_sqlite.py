"""Convert the framework's merged-parquet format to SQLite (mirror of
reference ``examples/02_data/03_convert_parquet_to_sqlite.py``), then read
an event back from the converted database."""

import os
import tempfile

from graphnet_tpu.constants import EXAMPLE_PARQUET_DATA
from graphnet_tpu.data.pre_configured import ParquetToSQLiteConverter


def main() -> None:
    outdir = tempfile.mkdtemp(prefix="parquet_to_sqlite_")
    converter = ParquetToSQLiteConverter(
        parquet_path=EXAMPLE_PARQUET_DATA,
        sqlite_path=outdir,
        tables=["mc_truth", "total"],
        num_workers=1,
    )
    converter.run()

    merged = os.path.join(outdir, "merged")
    dbs = [f for f in os.listdir(merged) if f.endswith(".db")]
    print(f"converted parquet -> {merged}: {dbs}")

    import sqlite3

    con = sqlite3.connect(os.path.join(merged, dbs[0]))
    n = con.execute("SELECT COUNT(DISTINCT event_no) FROM mc_truth")
    print("events in converted DB:", n.fetchone()[0])


if __name__ == "__main__":
    main()
