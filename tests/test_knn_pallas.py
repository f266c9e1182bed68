"""Pallas kNN kernel vs the XLA implementation (interpret mode on CPU;
the real-TPU equivalence is exercised by bench runs)."""

import numpy as np
import pytest

import jax

from graphnet_tpu.batch import make_batch
from graphnet_tpu.ops.knn import _knn_graph_xla


def test_pallas_knn_matches_xla_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.knn_pallas import knn_graph_pallas

    rng = np.random.default_rng(0)
    events = [
        rng.standard_normal((int(rng.integers(10, 64)), 3)).astype(
            np.float32
        )
        * 50.0
        for _ in range(6)
    ]
    batch = make_batch(events, length=64)
    i1, m1 = _knn_graph_xla(batch.x, batch.mask, k=8)
    with pltpu.force_tpu_interpret_mode():
        i2, m2 = knn_graph_pallas(batch.x, batch.mask, k=8, tile=64)
    i1, m1, i2, m2 = map(np.asarray, (i1, m1, i2, m2))
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(
        np.sort(np.where(m1, i1, -1), axis=-1),
        np.sort(np.where(m2, i2, -1), axis=-1),
    )


@pytest.mark.parametrize(
    "B,L,tile,bb",
    [
        (8, 128, 128, 8),  # multi-event program (events_per_program=8)
        (8, 128, 128, 4),  # multi-event program, partial
        (5, 64, 64, 4),  # B indivisible -> falls back to bb=1
        (4, 256, 128, 4),  # multi-tile (tl < L) -> falls back to bb=1
        (8, 128, 128, 1),  # production default
    ],
)
def test_pallas_knn_event_batching(B, L, tile, bb):
    from jax.experimental.pallas import tpu as pltpu

    from graphnet_tpu.ops.knn_pallas import knn_graph_pallas

    rng = np.random.default_rng(B * 1000 + L)
    events = [
        rng.standard_normal((int(rng.integers(L // 4, L)), 3)).astype(
            np.float32
        )
        * 50.0
        for _ in range(B)
    ]
    batch = make_batch(events, length=L)
    i1, m1 = _knn_graph_xla(batch.x, batch.mask, k=8)
    with pltpu.force_tpu_interpret_mode():
        i2, m2 = knn_graph_pallas(
            batch.x, batch.mask, k=8, tile=tile, events_per_program=bb
        )
    i1, m1, i2, m2 = map(np.asarray, (i1, m1, i2, m2))
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(
        np.sort(np.where(m1, i1, -1), axis=-1),
        np.sort(np.where(m2, i2, -1), axis=-1),
    )
