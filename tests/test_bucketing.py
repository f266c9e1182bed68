"""Bucket optimiser: DP optimality vs exhaustive search, alignment,
caps, and measured improvement through the real DataLoader."""

import itertools
import os

import numpy as np
import pytest

from graphnet_tpu.batch import DEFAULT_BUCKETS
from graphnet_tpu.data.bucketing import optimize_buckets, padding_efficiency


def brute_force(lengths, n_buckets, align):
    arr = np.asarray(lengths)
    aligned = (arr + align - 1) // align * align
    cand = sorted(set(int(c) for c in aligned))
    best, best_b = None, None
    for r in range(1, n_buckets + 1):
        for combo in itertools.combinations(cand, r):
            if combo[-1] != cand[-1]:
                continue
            b = np.asarray(combo)
            idx = np.searchsorted(b, aligned)
            slots = int(b[idx].sum())
            if best is None or slots < best:
                best, best_b = slots, combo
    return best, best_b


class TestOptimizeBuckets:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("n_buckets", [1, 2, 3, 4])
    def test_matches_exhaustive(self, seed, n_buckets):
        rng = np.random.default_rng(seed)
        lengths = np.concatenate(
            [
                rng.integers(1, 60, 40),
                rng.integers(100, 400, 15),
                rng.integers(900, 1100, 5),
            ]
        )
        got = optimize_buckets(lengths, n_buckets=n_buckets, align=16)
        best_slots, _ = brute_force(lengths, n_buckets, align=16)
        aligned = (lengths + 15) // 16 * 16
        b = np.asarray(got)
        idx = np.searchsorted(b, aligned)
        got_slots = int(b[idx].sum())
        assert got_slots == best_slots
        assert len(got) <= n_buckets
        assert all(x % 16 == 0 for x in got)
        assert got[-1] == int(aligned.max())

    def test_beats_powers_of_two(self):
        """On a skewed realistic distribution the optimised buckets are
        strictly more efficient than the shape-agnostic defaults."""
        rng = np.random.default_rng(7)
        lengths = np.clip(
            rng.lognormal(3.3, 0.5, 5000).astype(int), 2, 4000
        )
        eff_def = padding_efficiency(lengths, DEFAULT_BUCKETS)
        opt_same = optimize_buckets(
            lengths, n_buckets=len(DEFAULT_BUCKETS), align=16
        )
        assert padding_efficiency(lengths, opt_same) > eff_def
        # and HALF the compile budget already comes within 2% of the
        # nine shape-agnostic defaults — fewer executables, same waste
        opt4 = optimize_buckets(lengths, n_buckets=4, align=16)
        assert padding_efficiency(lengths, opt4) > 0.98 * eff_def

    def test_max_length_cap(self):
        lengths = [5, 10, 5000]
        got = optimize_buckets(
            lengths, n_buckets=2, align=16, max_length=768
        )
        assert got[-1] == 768
        assert padding_efficiency(lengths, got) > 0
        # the hard cap wins over alignment (100 is not a multiple of 16)
        got = optimize_buckets(
            lengths, n_buckets=2, align=16, max_length=100
        )
        assert got[-1] == 100

    def test_small_inputs_and_validation(self):
        assert optimize_buckets([3], n_buckets=4, align=16) == (16,)
        assert optimize_buckets([16, 32], n_buckets=4, align=16) == (
            16,
            32,
        )
        with pytest.raises(ValueError):
            optimize_buckets([], n_buckets=2)
        with pytest.raises(ValueError):
            optimize_buckets([0, 3], n_buckets=2)
        with pytest.raises(ValueError):
            optimize_buckets([3], n_buckets=0)

    def test_efficiency_estimator(self):
        # by hand: lengths (3, 10) with bucket (16,) -> 13/32
        assert padding_efficiency([3, 10], [16]) == pytest.approx(
            13 / 32
        )
        # event beyond largest bucket truncates (full slots)
        assert padding_efficiency([40], [16]) == 1.0


class TestLoaderIntegration:
    def test_dataloader_measured_efficiency_improves(self):
        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.constants import FEATURES, TRUTH
        from graphnet_tpu.data.dataloader import DataLoader
        from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
        from graphnet_tpu.models.detector.prometheus import Prometheus
        from graphnet_tpu.models.graphs import KNNGraph

        if not os.path.exists(EXAMPLE_SQLITE_DATA):
            pytest.skip("example data not present")
        ds = SQLiteDataset(
            path=EXAMPLE_SQLITE_DATA,
            graph_definition=KNNGraph(detector=Prometheus()),
            pulsemaps="total",
            features=FEATURES.PROMETHEUS,
            truth=TRUTH.PROMETHEUS,
            truth_table="mc_truth",
        )
        lengths = ds.event_lengths()
        opt = optimize_buckets(lengths, n_buckets=3, align=16)

        def measured(buckets):
            loader = DataLoader(
                ds, batch_size=8, shuffle=False, buckets=buckets
            )
            for _ in loader:
                pass
            return loader.padding_efficiency

        eff_opt = measured(opt)
        eff_def = measured(DEFAULT_BUCKETS)
        assert np.isfinite(eff_opt) and np.isfinite(eff_def)
        assert eff_opt >= eff_def

        # buckets="auto:N" resolves to the same optimised set lazily
        auto = DataLoader(
            ds, batch_size=8, shuffle=False, buckets="auto:3"
        )
        for _ in auto:
            pass
        assert auto.buckets == opt
        assert auto.padding_efficiency == pytest.approx(eff_opt)
        with pytest.raises(ValueError):
            DataLoader(ds, buckets="automatic")
