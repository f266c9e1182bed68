"""Numerical parity of the dense-padded DynEdge against an independent
sparse (edge-list + scatter) numpy implementation — the reference's
computational model (PyG EdgeConv + torch_scatter; SURVEY.md §2.3).

Both run the same flax parameters; activations must agree to fp32
tolerance.  This is the activation-parity check of SURVEY.md §7 step 2,
implemented from the documented semantics (not reference code) since
torch_geometric is unavailable in this environment.
"""

import numpy as np
import pytest

import jax

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge


# --------------------------- sparse numpy reference ------------------------


def np_knn_edges(coords, k):
    """Edge list (j -> i) with torch_cluster semantics: per-node k nearest,
    no self-loops, ties toward lower index."""
    n = len(coords)
    d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    src, dst = [], []
    for i in range(n):
        nbrs = np.argsort(d2[i], kind="stable")[: min(k, n - 1)]
        for j in nbrs:
            src.append(j)
            dst.append(i)
    return np.asarray(src), np.asarray(dst)


def np_mlp(params, x, activation=lambda v: np.maximum(v, 0)):
    i = 0
    while f"dense_{i}" in params:
        W = np.asarray(params[f"dense_{i}"]["kernel"])
        b = np.asarray(params[f"dense_{i}"]["bias"])
        x = x @ W + b
        x = activation(x)
        i += 1
    return x


def np_edgeconv(params, x, src, dst, n):
    """EdgeConv: msg = mlp(cat[x_i, x_j - x_i]); scatter-add onto i.

    The flax module linearises the first layer into self/neighbour Dense
    terms (exact rewrite of Linear(2D, H) on cat[x_i, x_j - x_i]); this
    sparse reference applies the same two matrices per edge.
    """
    Wa = np.asarray(params["self_dense"]["kernel"])
    ba = np.asarray(params["self_dense"]["bias"])
    Wb = np.asarray(params["nbr_dense"]["kernel"])
    x_i, x_j = x[dst], x[src]
    msgs = np.maximum(x_i @ Wa + ba + x_j @ Wb, 0)
    if "out_kernel" in params:
        msgs = np.maximum(
            msgs @ np.asarray(params["out_kernel"])
            + np.asarray(params["out_bias"]),
            0,
        )
    elif "nn" in params:
        msgs = np_mlp(params["nn"], msgs)
    out = np.zeros((n, msgs.shape[1]), np.float32)
    np.add.at(out, dst, msgs)
    return out


def np_homophily(values, src, dst):
    if len(src) == 0:
        return 0.0
    return float(np.mean(values[src] == values[dst]))


def np_dynedge_forward(params, x, k=8):
    """Full sparse DynEdge forward for ONE event (default config)."""
    params = params["params"]
    n = len(x)
    src, dst = np_knn_edges(x[:, :3], k)

    homs = [np_homophily(x[:, c], src, dst) for c in range(4)]
    gv = np.concatenate(
        [x.mean(0), np.asarray(homs), [np.log10(n)]]
    ).astype(np.float32)
    h = np.concatenate(
        [x, np.tile(gv, (n, 1))], axis=1
    ).astype(np.float32)

    skips = [h]
    for li in range(4):
        conv_params = params[f"conv_{li}"]["conv"]
        h = np_edgeconv(conv_params, h, src, dst, n)
        src, dst = np_knn_edges(h[:, :3], k)
        skips.append(h)

    h = np.concatenate(skips, axis=1)
    h = np_mlp(params["post_processing"], h)
    pooled = np.concatenate(
        [h.min(0), h.max(0), h.mean(0), h.sum(0)]
    )
    return np_mlp(params["readout"], pooled[None, :])[0]


# ------------------------------- the test ----------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_dynedge_matches_sparse_numpy(seed):
    rng = np.random.default_rng(seed)
    events = [
        rng.standard_normal((int(rng.integers(6, 40)), 7)).astype(
            np.float32
        )
        for _ in range(3)
    ]
    batch = make_batch(events, length=64)
    model = DynEdge(nb_inputs=7)
    params = model.init(jax.random.PRNGKey(seed), batch)
    dense_out = np.asarray(model.apply(params, batch))

    for b, ev in enumerate(events):
        sparse_out = np_dynedge_forward(
            jax.device_get(params), ev
        )
        np.testing.assert_allclose(
            dense_out[b],
            sparse_out,
            rtol=5e-3,
            atol=5e-4,
            err_msg=f"event {b}",
        )
