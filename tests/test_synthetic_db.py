"""Synthetic Prometheus DB generator (datasets/synthetic.py): schema,
determinism, and loadability through the real SQLiteDataset/DataLoader."""

import sqlite3

import numpy as np

from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.dataloader import DataLoader
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.datasets.synthetic import generate_prometheus_db
from graphnet_tpu.models.detector.prometheus import Prometheus
from graphnet_tpu.models.graphs import KNNGraph


def _make(tmp_path, n=64, seed=0):
    return generate_prometheus_db(
        str(tmp_path / f"synth_{n}_{seed}.db"), n_events=n, seed=seed
    )


def test_schema_and_counts(tmp_path):
    path = _make(tmp_path, n=64)
    con = sqlite3.connect(path)
    try:
        n_truth = con.execute("SELECT COUNT(*) FROM mc_truth").fetchone()[0]
        assert n_truth == 64
        evs = [
            r[0]
            for r in con.execute(
                "SELECT DISTINCT event_no FROM total ORDER BY event_no"
            )
        ]
        assert evs == list(range(64))
        lo, hi = con.execute(
            "SELECT MIN(c), MAX(c) FROM "
            "(SELECT COUNT(*) c FROM total GROUP BY event_no)"
        ).fetchone()
        assert 3 <= lo and hi <= 99  # source pulse-count range preserved
        # index exists (the dataset's per-event query relies on it)
        idx = con.execute(
            "SELECT name FROM sqlite_master WHERE type='index'"
        ).fetchall()
        assert ("event_no_total",) in idx
    finally:
        con.close()


def test_deterministic_in_seed(tmp_path):
    p1 = _make(tmp_path, n=32, seed=7)
    tmp2 = tmp_path / "b"
    tmp2.mkdir()
    p2 = generate_prometheus_db(
        str(tmp2 / "synth.db"), n_events=32, seed=7
    )
    c1, c2 = sqlite3.connect(p1), sqlite3.connect(p2)
    try:
        r1 = c1.execute("SELECT * FROM total ORDER BY event_no").fetchall()
        r2 = c2.execute("SELECT * FROM total ORDER BY event_no").fetchall()
        assert r1 == r2
    finally:
        c1.close()
        c2.close()


def test_loads_through_dataset_and_loader(tmp_path):
    path = _make(tmp_path, n=64)
    ds = SQLiteDataset(
        path=path,
        graph_definition=KNNGraph(detector=Prometheus()),
        pulsemaps="total",
        features=FEATURES.PROMETHEUS,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    assert len(ds) == 64
    loader = DataLoader(ds, batch_size=16, shuffle=False, buckets=(128,))
    total = 0
    for batch in loader:
        total += batch.batch_size
        assert np.isfinite(np.asarray(batch.x)).all()
    assert total == 64
