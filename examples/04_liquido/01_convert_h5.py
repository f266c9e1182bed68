"""Convert LiquidO h5 files to SQLite
(mirror of reference ``examples/05_liquido/01_convert_h5.py``)."""

import os
import tempfile

from graphnet_tpu.constants import DATA_DIR
from graphnet_tpu.data.dataconverter import DataConverter
from graphnet_tpu.data.extractors.liquido import (
    H5HitExtractor,
    H5TruthExtractor,
)
from graphnet_tpu.data.readers.liquido_reader import LiquidOReader
from graphnet_tpu.data.writers.sqlite_writer import SQLiteWriter


def main() -> None:
    raw = os.path.join(DATA_DIR, "tests", "liquid-o")
    outdir = tempfile.mkdtemp(prefix="liquido_sqlite_")
    converter = DataConverter(
        file_reader=LiquidOReader(),
        save_method=SQLiteWriter(),
        outdir=outdir,
        extractors=[H5HitExtractor(), H5TruthExtractor()],
    )
    converter(raw)
    print(f"converted to {outdir}: {os.listdir(outdir)}")


if __name__ == "__main__":
    main()
