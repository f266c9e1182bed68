"""Parallel DataConverter: unique event_no assignment across pool workers
(the shared locked counter, reference ``dataconverter.py:255-300``)."""

import os
import shutil
import sqlite3

import pytest

from graphnet_tpu.constants import DATA_DIR
from graphnet_tpu.data.dataconverter import DataConverter
from graphnet_tpu.data.extractors.prometheus import (
    PrometheusFeatureExtractor,
    PrometheusTruthExtractor,
)
from graphnet_tpu.data.readers.prometheus_reader import PrometheusReader
from graphnet_tpu.data.writers.sqlite_writer import SQLiteWriter

RAW = os.path.join(
    DATA_DIR, "tests", "prometheus", "22980001_photons.parquet"
)


@pytest.mark.skipif(
    not os.path.exists(RAW), reason="raw test data missing"
)
def test_parallel_event_no_unique(tmp_path):
    indir = tmp_path / "raw"
    indir.mkdir()
    # three copies -> three files processed by two workers
    for i in range(3):
        shutil.copy(RAW, indir / f"file_{i}.parquet")
    outdir = str(tmp_path / "out")
    converter = DataConverter(
        file_reader=PrometheusReader(),
        save_method=SQLiteWriter(),
        outdir=outdir,
        extractors=[
            PrometheusTruthExtractor(),
            PrometheusFeatureExtractor(),
        ],
        num_workers=2,
    )
    converter(str(indir))
    dbs = sorted(f for f in os.listdir(outdir) if f.endswith(".db"))
    assert len(dbs) == 3
    all_event_nos = []
    for db in dbs:
        with sqlite3.connect(os.path.join(outdir, db)) as con:
            rows = con.execute(
                "SELECT event_no FROM mc_truth"
            ).fetchall()
        all_event_nos.extend(r[0] for r in rows)
    # 3 files x 10 events, all globally unique
    assert len(all_event_nos) == 30
    assert len(set(all_event_nos)) == 30

    # merge combines them into one database
    converter.merge_files()
    merged = os.path.join(outdir, "merged", "merged.db")
    with sqlite3.connect(merged) as con:
        n = con.execute("SELECT COUNT(*) FROM mc_truth").fetchone()[0]
    assert n == 30
