"""Per-event weight fitting (mirror of reference
``src/graphnet/training/weight_fitting.py:16-246``): flatten (or custom-
shape) a truth variable's spectrum and optionally write the weights back to
the SQLite database as a new table."""

from __future__ import annotations

import sqlite3
from typing import Any, Callable, List, Optional

import numpy as np

from graphnet_tpu.utils.logging import Logger


def create_table_and_save_to_sql(
    df, table_name: str, database_path: str, index_column: str = "event_no"
) -> None:
    """Write a DataFrame to the database as ``table_name`` with an indexed
    ``event_no`` primary key (mirror of reference
    ``data/utilities/sqlite_utilities.py`` save path)."""
    with sqlite3.connect(database_path) as con:
        df.to_sql(table_name, con, if_exists="replace", index=False)
        con.execute(
            f"CREATE INDEX IF NOT EXISTS idx_{table_name}_{index_column} "
            f"ON {table_name} ({index_column})"
        )


class WeightFitter(Logger):
    """Base: fit per-event weights from a truth variable's histogram."""

    def __init__(
        self,
        database_path: str,
        truth_table: str = "truth",
        index_column: str = "event_no",
    ):
        super().__init__()
        self._database_path = database_path
        self._truth_table = truth_table
        self._index_column = index_column
        self._max_weight: Optional[float] = None

    def _get_truth(
        self, variable: str, selection: Optional[List[int]] = None
    ):
        import pandas as pd

        q = (
            f"select {self._index_column}, {variable} "
            f"from {self._truth_table}"
        )
        if selection is not None:
            q += f" where {self._index_column} in {tuple(selection)}"
        with sqlite3.connect(self._database_path) as con:
            return pd.read_sql(q, con)

    def fit(
        self,
        bins,
        variable: str,
        weight_name: Optional[str] = None,
        add_to_database: bool = False,
        selection: Optional[List[int]] = None,
        transform: Optional[Callable] = None,
        db_count_norm: Optional[int] = None,
        automatic_log_bins: bool = False,
        max_weight: Optional[float] = None,
        **kwargs: Any,
    ):
        self._variable = variable
        self._bins = bins
        if max_weight is not None:
            assert 0 < max_weight < 1
        self._max_weight = max_weight
        self._weight_name = weight_name or self._generate_weight_name()

        truth = self._get_truth(variable, selection)
        if transform is not None:
            truth[variable] = transform(truth[variable])
        if automatic_log_bins:
            assert isinstance(bins, int)
            self._bins = np.logspace(
                np.log10(truth[variable].min()),
                np.log10(truth[variable].max() + 1),
                bins,
            )

        weights = self._fit_weights(truth, **kwargs)
        if self._max_weight is not None:
            cap = weights[self._weight_name].sum() * self._max_weight
            weights[self._weight_name] = np.minimum(
                weights[self._weight_name], cap
            )
        if db_count_norm is not None:
            weights[self._weight_name] *= (
                db_count_norm / weights[self._weight_name].sum()
            )
        if add_to_database:
            create_table_and_save_to_sql(
                weights[[self._index_column, self._weight_name]],
                self._weight_name,
                self._database_path,
                self._index_column,
            )
        return weights.sort_values(self._index_column).reset_index(
            drop=True
        )

    def _fit_weights(self, truth, **kwargs):
        raise NotImplementedError

    def _generate_weight_name(self) -> str:
        raise NotImplementedError

    def _uniform_sample_weights(self, truth) -> np.ndarray:
        bin_counts, _ = np.histogram(
            truth[self._variable], bins=self._bins
        )
        bin_weights = 1.0 / np.where(bin_counts == 0, np.nan, bin_counts)
        ix = np.clip(
            np.digitize(truth[self._variable], bins=self._bins) - 1,
            0,
            len(bin_weights) - 1,
        )
        w = bin_weights[ix]
        return w / np.nanmean(w)


class Uniform(WeightFitter):
    """Weights flattening the variable's spectrum
    (reference ``:148-175``)."""

    def _fit_weights(self, truth):
        truth[self._weight_name] = self._uniform_sample_weights(truth)
        return truth.sort_values(self._index_column).reset_index(drop=True)

    def _generate_weight_name(self) -> str:
        return self._variable + "_uniform_weight"


class BjoernLow(WeightFitter):
    """Uniform below ``x_low``; ``1/(1 + alpha (x - x_low))`` falloff above
    (reference ``:178-246``)."""

    def _fit_weights(
        self,
        truth,
        x_low: float,
        alpha: float = 0.05,
        percentile: bool = False,
    ):
        truth[self._weight_name] = self._uniform_sample_weights(truth)
        bin_counts, _ = np.histogram(
            truth[self._variable],
            bins=self._bins,
            weights=truth[self._weight_name],
        )
        c = np.nanmax(bin_counts)

        if percentile:
            assert 0 < x_low < 1
            x_low = np.quantile(truth[self._variable], x_low)

        above = truth[self._variable] > x_low
        truth.loc[above, self._weight_name] = 1.0 / (
            1.0 + alpha * (truth.loc[above, self._variable] - x_low)
        )
        bin_counts, _ = np.histogram(
            truth[self._variable],
            bins=self._bins,
            weights=truth[self._weight_name],
        )
        d = np.nanmax(bin_counts)
        truth.loc[above, self._weight_name] *= c / d
        return truth.sort_values(self._index_column).reset_index(drop=True)

    def _generate_weight_name(self) -> str:
        return self._variable + "_bjoern_low_weight"
