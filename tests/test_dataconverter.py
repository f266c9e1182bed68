"""ETL integration tests: convert raw Prometheus/LiquidO files to SQLite
and Parquet, then read them back through the Dataset layer — the
reference's ordered convert → read → compare pipeline (SURVEY.md §4)."""

import os
import sqlite3

import numpy as np
import pytest

from graphnet_tpu.constants import DATA_DIR
from graphnet_tpu.data.dataconverter import DataConverter
from graphnet_tpu.data.extractors.liquido import (
    H5HitExtractor,
    H5TruthExtractor,
)
from graphnet_tpu.data.extractors.prometheus import (
    PrometheusFeatureExtractor,
    PrometheusTruthExtractor,
)
from graphnet_tpu.data.readers.liquido_reader import LiquidOReader
from graphnet_tpu.data.readers.prometheus_reader import PrometheusReader
from graphnet_tpu.data.writers.parquet_writer import ParquetWriter
from graphnet_tpu.data.writers.sqlite_writer import SQLiteWriter

PROMETHEUS_RAW = os.path.join(DATA_DIR, "tests", "prometheus")
LIQUIDO_RAW = os.path.join(DATA_DIR, "tests", "liquid-o")


@pytest.mark.skipif(
    not os.path.isdir(PROMETHEUS_RAW), reason="raw test data missing"
)
class TestPrometheusConversion:
    def test_to_sqlite_and_read(self, tmp_path):
        outdir = str(tmp_path / "sqlite")
        converter = DataConverter(
            file_reader=PrometheusReader(),
            save_method=SQLiteWriter(),
            outdir=outdir,
            extractors=[
                PrometheusTruthExtractor(),
                PrometheusFeatureExtractor(),
            ],
        )
        converter(PROMETHEUS_RAW)
        dbs = [f for f in os.listdir(outdir) if f.endswith(".db")]
        assert len(dbs) == 1
        db = os.path.join(outdir, dbs[0])
        with sqlite3.connect(db) as con:
            tables = {
                r[0]
                for r in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                )
            }
            assert {"mc_truth", "photons"} <= tables
            n_truth = con.execute(
                "SELECT COUNT(*) FROM mc_truth"
            ).fetchone()[0]
            n_photon_events = con.execute(
                "SELECT COUNT(DISTINCT event_no) FROM photons"
            ).fetchone()[0]
        assert n_truth == 10
        # one bundled event has zero photons; rows are only written for
        # events with data (matching reference writer behaviour)
        assert n_photon_events == 9

        # read back through the Dataset layer
        from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
        from graphnet_tpu.models.detector.prometheus import Prometheus
        from graphnet_tpu.models.graphs import KNNGraph

        ds = SQLiteDataset(
            path=db,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="photons",
            features=[
                "sensor_pos_x",
                "sensor_pos_y",
                "sensor_pos_z",
                "t",
            ],
            truth=["initial_state_energy", "initial_state_zenith"],
            truth_table="mc_truth",
        )
        assert len(ds) == 10
        ev = ds[0]
        assert ev.x.shape[1] == 4 and ev.x.shape[0] > 0

    def test_to_parquet_merge_and_read(self, tmp_path):
        outdir = str(tmp_path / "parquet")
        converter = DataConverter(
            file_reader=PrometheusReader(),
            save_method=ParquetWriter(truth_table="mc_truth"),
            outdir=outdir,
            extractors=[
                PrometheusTruthExtractor(),
                PrometheusFeatureExtractor(),
            ],
        )
        converter(PROMETHEUS_RAW)
        converter.merge_files(events_per_batch=4)
        merged = os.path.join(outdir, "merged")
        assert os.path.isdir(os.path.join(merged, "mc_truth"))
        assert os.path.isdir(os.path.join(merged, "photons"))

        from graphnet_tpu.data.parquet_dataset import ParquetDataset
        from graphnet_tpu.models.detector.prometheus import Prometheus
        from graphnet_tpu.models.graphs import KNNGraph

        ds = ParquetDataset(
            path=merged,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="photons",
            features=[
                "sensor_pos_x",
                "sensor_pos_y",
                "sensor_pos_z",
                "t",
            ],
            truth=["initial_state_energy", "initial_state_zenith"],
            truth_table="mc_truth",
        )
        assert len(ds) == 10
        assert ds.chunk_sizes == [4, 4, 2]
        ev = ds[0]
        assert ev.x.shape[1] == 4


@pytest.mark.skipif(
    not os.path.isdir(LIQUIDO_RAW), reason="raw test data missing"
)
class TestLiquidOConversion:
    def test_to_sqlite(self, tmp_path):
        outdir = str(tmp_path / "sqlite")
        converter = DataConverter(
            file_reader=LiquidOReader(),
            save_method=SQLiteWriter(),
            outdir=outdir,
            extractors=[H5HitExtractor(), H5TruthExtractor()],
        )
        converter(LIQUIDO_RAW)
        dbs = [f for f in os.listdir(outdir) if f.endswith(".db")]
        assert len(dbs) == 1
        with sqlite3.connect(os.path.join(outdir, dbs[0])) as con:
            n = con.execute(
                "SELECT COUNT(*) FROM TruthData"
            ).fetchone()[0]
            assert n == 100
            cols = [
                r[1]
                for r in con.execute("PRAGMA table_info(HitData)")
            ]
            assert "sipm_x" in cols and "event_no" in cols
