"""Convert raw Prometheus simulation files to SQLite
(mirror of reference ``examples/06_prometheus``)."""

import os
import tempfile

from graphnet_tpu.constants import DATA_DIR
from graphnet_tpu.data.dataconverter import DataConverter
from graphnet_tpu.data.extractors.prometheus import (
    PrometheusFeatureExtractor,
    PrometheusTruthExtractor,
)
from graphnet_tpu.data.readers.prometheus_reader import PrometheusReader
from graphnet_tpu.data.writers.sqlite_writer import SQLiteWriter


def main() -> None:
    raw = os.path.join(DATA_DIR, "tests", "prometheus")
    outdir = tempfile.mkdtemp(prefix="prometheus_sqlite_")
    converter = DataConverter(
        file_reader=PrometheusReader(),
        save_method=SQLiteWriter(),
        outdir=outdir,
        extractors=[
            PrometheusTruthExtractor(),
            PrometheusFeatureExtractor(),
        ],
        num_workers=1,
    )
    converter(raw)
    print(f"converted to {outdir}: {os.listdir(outdir)}")


if __name__ == "__main__":
    main()
