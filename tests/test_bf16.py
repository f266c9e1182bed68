"""bf16 compute-dtype coverage: fp32 params, outputs finite and within
bf16-level tolerance of the fp32 path (single conv layer — multi-layer
dynamic-kNN models amplify rounding discretely via neighbour flips)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO
from graphnet_tpu.models.gnn.icemix import DeepIce


def events(B=3, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((int(rng.integers(8, 30)), 4)).astype(
            np.float32
        )
        for _ in range(B)
    ]


@pytest.mark.parametrize(
    "make_model",
    [
        lambda cd: DynEdge(
            nb_inputs=4,
            dynedge_layer_sizes=((128, 256),),
            compute_dtype=cd,
        ),
        lambda cd: DynEdgeTITO(
            nb_inputs=4,
            dyntrans_layer_sizes=((64, 64),),
            n_head=4,
            compute_dtype=cd,
        ),
        lambda cd: DeepIce(
            hidden_dim=64,
            seq_length=32,
            depth=2,
            depth_rel=2,
            n_rel=1,
            head_size=16,
            n_features=4,
            compute_dtype=cd,
        ),
        lambda cd: DeepIce(
            hidden_dim=64,
            seq_length=32,
            depth=1,
            depth_rel=2,
            n_rel=1,
            head_size=16,
            n_features=4,
            rel_bias_chunks=4,
            compute_dtype=cd,
        ),
    ],
    ids=["dynedge", "tito", "deepice", "deepice_chunked"],
)
def test_bf16_close_to_fp32_and_params_fp32(make_model):
    batch = make_batch(events(), length=32)
    m32 = make_model(None)
    mbf = make_model("bfloat16")
    params = m32.init(jax.random.PRNGKey(0), batch)
    # params created under bf16 init must still be fp32
    params_bf = mbf.init(jax.random.PRNGKey(0), batch)
    for leaf in jax.tree_util.tree_leaves(params_bf):
        assert leaf.dtype == jnp.float32

    o32 = np.asarray(m32.apply(params, batch))
    obf = np.asarray(mbf.apply(params, batch))
    assert obf.dtype == np.float32
    assert np.isfinite(obf).all()
    scale = np.abs(o32).mean() + 1e-3
    assert np.abs(o32 - obf).mean() / scale < 0.05
