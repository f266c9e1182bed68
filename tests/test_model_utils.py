"""models/utils.py parity helpers (reference ``models/utils.py``)."""

import numpy as np
import jax.numpy as jnp

from graphnet_tpu.models.utils import (
    array_to_sequence,
    calculate_distance_matrix,
    calculate_xyzt_homophily,
    get_fields,
    knn_graph_batch,
)


def test_distance_matrix_single_and_batched():
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((5, 3)).astype(np.float32)
    d = np.asarray(calculate_distance_matrix(jnp.asarray(xyz)))
    expect = np.sqrt(
        ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    )
    np.testing.assert_allclose(d, expect, rtol=1e-5, atol=1e-6)
    batched = np.asarray(
        calculate_distance_matrix(jnp.asarray(xyz[None]))
    )
    np.testing.assert_allclose(batched[0], expect, rtol=1e-5, atol=1e-6)


def test_xyzt_homophily_matches_manual():
    # 1 event, 3 nodes, k=1 ring; features engineered so x matches on
    # every edge, y on none
    idx = jnp.asarray([[[1], [2], [0]]], dtype=jnp.int32)
    em = jnp.ones((1, 3, 1), bool)
    x = jnp.asarray(
        [[[1.0, 1.0, 0.0, 5.0], [1.0, 2.0, 0.0, 5.0], [1.0, 3.0, 0.0, 5.0]]]
    )
    hx, hy, hz, ht = calculate_xyzt_homophily(x, idx, em)
    assert hx.shape == (1, 1)
    assert float(hx[0, 0]) == 1.0
    assert float(hy[0, 0]) == 0.0
    assert float(hz[0, 0]) == 1.0
    assert float(ht[0, 0]) == 1.0


def test_knn_graph_batch_per_event_k():
    rng = np.random.default_rng(1)
    coords = jnp.asarray(
        rng.standard_normal((2, 8, 3)).astype(np.float32)
    )
    mask = jnp.ones((2, 8), bool)
    idx, em = knn_graph_batch(coords, mask, [2, 4])
    assert idx.shape == (2, 8, 4)
    # event 0 has only its first 2 edge slots valid, event 1 all 4
    assert bool(em[0, :, :2].all()) and not bool(em[0, :, 2:].any())
    assert bool(em[1].all())


def test_array_to_sequence_roundtrip():
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    batch_idx = np.asarray([0, 0, 0, 1, 1])
    xp, mask, lens = array_to_sequence(x, batch_idx)
    assert xp.shape == (2, 3, 2)
    assert lens.tolist() == [3, 2]
    np.testing.assert_array_equal(xp[0], x[:3])
    np.testing.assert_array_equal(xp[1, :2], x[3:])
    assert xp[1, 2].tolist() == [0.0, 0.0]
    assert mask.tolist() == [[True, True, True], [True, True, False]]
    np.testing.assert_array_equal(xp[mask], x)


def test_get_fields_from_dicts():
    events = [
        {"energy": 1.0, "zenith": 0.1},
        {"energy": 2.0, "zenith": 0.2},
    ]
    out = get_fields(events, ["energy", "zenith"])
    np.testing.assert_allclose(
        out, [[1.0, 0.1], [2.0, 0.2]], rtol=1e-6
    )
