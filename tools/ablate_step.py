"""Ablation timings for the canonical DynEdge train step on the real TPU.

Each variant is timed with the carry-threaded ``lax.scan`` (params flow
through the carry so XLA cannot hoist the loop-invariant body — the
"benchmark pitfall" in CLAUDE.md).  Prints one JSON line per variant as it
completes (compiles are 3-6 min each through the tunnel; run in
background, capture stdout to a file).

Variants:
  full          train step (fwd+bwd+Adam), bf16 + Pallas — the headline
  fwd           forward + loss only
  fwd_noknn     forward with all 4 latent kNN rebuilds replaced by a
                constant adjacency (isolates kNN kernel + glue cost;
                gathers/reductions still run)
  fwd_xla_knn   forward with the XLA kNN (distance matrix + top_k)
  fwd_unfused   forward with the fused EdgeConv kernel disabled
  opt_only      Adam update alone on the same param tree
  matmul_floor  the bare dense matmul sequence of one step (fwd only)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, L, D, K = 128, 128, 4, 8
N_STEPS = 20
REPS = 3


def make_batch():
    from graphnet_tpu.batch import make_batch as mb

    rng = np.random.default_rng(0)
    events = []
    for _ in range(B):
        n = int(rng.integers(L // 2, L + 1))
        events.append(
            np.concatenate(
                [
                    rng.standard_normal((n, 3)).astype(np.float32) * 2.0,
                    rng.random((n, 1)).astype(np.float32),
                ],
                axis=1,
            )
        )
    labels = {
        "total_energy": np.abs(
            rng.standard_normal(B).astype(np.float32) * 100 + 200
        )
    }
    return mb(events, labels=labels, length=L)


def build_model():
    import jax.numpy as jnp

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    return StandardModel(
        backbone=DynEdge(nb_inputs=D, compute_dtype="bfloat16"),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )


def timed_scan(fn, carry, batch):
    """fn(carry, batch) -> (carry, scalar). Returns ms/step."""
    import jax

    @jax.jit
    def steps(carry, batch):
        def one(c, _):
            return fn(c, batch)

        carry2, outs = jax.lax.scan(one, carry, None, length=N_STEPS)
        return carry2, outs[-1]

    carry2, out = steps(carry, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry2, out = steps(carry2, batch)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (REPS * N_STEPS) * 1e3


def emit(name, ms):
    print(json.dumps({"variant": name, "ms_per_step": round(ms, 3)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    variants = sys.argv[1:] or [
        "full",
        "fwd",
        "fwd_noknn",
        "fwd_xla_knn",
        "fwd_unfused",
        "opt_only",
        "matmul_floor",
    ]

    model = build_model()
    batch = jax.device_put(make_batch())
    params = model.init(jax.random.PRNGKey(0), batch)
    optimizer = optax.flatten(optax.adam(1e-3, eps=1e-3))
    opt_state = optimizer.init(params)

    import graphnet_tpu.models.components.layers as layers_mod
    import graphnet_tpu.models.gnn.dynedge as dynedge_mod
    from graphnet_tpu.ops import knn as knn_mod

    def full_step(carry, batch):
        p, o = carry

        def loss_fn(p_):
            return model.loss(model.apply(p_, batch), batch.labels)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o)
        return (optax.apply_updates(p, updates), o), loss

    def fwd_step(carry, batch):
        (p,) = carry
        loss = model.loss(model.apply(p, batch), batch.labels)
        # thread params through the carry via a loss-dependent no-op so
        # the scan body cannot be hoisted
        p = jax.tree.map(lambda a: a + 0.0 * loss.astype(a.dtype), p)
        return (p,), loss

    if "full" in variants:
        emit("full", timed_scan(full_step, (params, opt_state), batch))
    if "fwd" in variants:
        emit("fwd", timed_scan(fwd_step, (params,), batch))

    if "fwd_noknn" in variants:
        orig = layers_mod.knn_graph

        def const_knn(coords, mask, k, **kw):
            Bc, Lc, _ = coords.shape
            idx = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None, None, :], (Bc, Lc, k)
            )
            em = mask[:, :, None] & jnp.ones((Bc, Lc, k), bool)
            return idx, em

        layers_mod.knn_graph = const_knn
        try:
            emit("fwd_noknn", timed_scan(fwd_step, (params,), batch))
        finally:
            layers_mod.knn_graph = orig

    if "fwd_xla_knn" in variants:
        orig_l, orig_d = layers_mod.knn_graph, dynedge_mod.knn_graph
        layers_mod.knn_graph = knn_mod._knn_graph_xla
        dynedge_mod.knn_graph = knn_mod._knn_graph_xla
        try:
            emit("fwd_xla_knn", timed_scan(fwd_step, (params,), batch))
        finally:
            layers_mod.knn_graph = orig_l
            dynedge_mod.knn_graph = orig_d

    if "fwd_nofusedknn" in variants:
        # fused EdgeConv kernel still on, but the conv+kNN fusion off:
        # isolates exactly what the in-kernel kNN buys in-model
        orig_fk = layers_mod.EdgeConv._use_fused_knn
        layers_mod.EdgeConv._use_fused_knn = (
            lambda self, L_, mask: False
        )
        try:
            emit(
                "fwd_nofusedknn",
                timed_scan(fwd_step, (params,), batch),
            )
        finally:
            layers_mod.EdgeConv._use_fused_knn = orig_fk

    if "full_nofusedknn" in variants:
        orig_fk = layers_mod.EdgeConv._use_fused_knn
        layers_mod.EdgeConv._use_fused_knn = (
            lambda self, L_, mask: False
        )
        try:
            emit(
                "full_nofusedknn",
                timed_scan(full_step, (params, opt_state), batch),
            )
        finally:
            layers_mod.EdgeConv._use_fused_knn = orig_fk

    if "fwd_unfused" in variants:
        orig_uf = layers_mod.EdgeConv._use_fused
        layers_mod.EdgeConv._use_fused = lambda self, L_: False
        try:
            emit("fwd_unfused", timed_scan(fwd_step, (params,), batch))
        finally:
            layers_mod.EdgeConv._use_fused = orig_uf

    if "opt_only" in variants:
        grads = jax.tree.map(jnp.ones_like, params)

        def opt_step(carry, batch):
            p, o = carry
            updates, o = optimizer.update(
                jax.tree.map(lambda g, q: g * 1e-6 + q * 1e-9, grads, p), o
            )
            p = optax.apply_updates(p, updates)
            return (p, o), updates["params"]["backbone"]["readout"][
                "dense_0"
            ]["bias"][0]

        emit("opt_only", timed_scan(opt_step, (params, opt_state), batch))

    if "matmul_floor" in variants:
        # the dense matmul sequence of one forward: 4 conv blocks as
        # [B*L*K, h] x [h, h'] pairs + post + readout, bf16
        key = jax.random.PRNGKey(1)
        x0 = jax.random.normal(key, (B * L, K, 13 * 2), jnp.bfloat16)
        ws = []
        dims = [(26, 128, 256)] + [(512, 336, 256)] * 3
        for i, (d2, h1, h2) in enumerate(dims):
            k1, k2, key = jax.random.split(key, 3)
            ws.append(
                (
                    jax.random.normal(k1, (d2, h1), jnp.bfloat16),
                    jax.random.normal(k2, (h1, h2), jnp.bfloat16),
                )
            )
        k1, k2, key = jax.random.split(key, 3)
        wpost = (
            jax.random.normal(k1, (13 + 4 * 256, 336), jnp.bfloat16),
            jax.random.normal(k2, (336, 256), jnp.bfloat16),
        )
        wread = jax.random.normal(key, (1024, 128), jnp.bfloat16)

        def mm_step(carry, _):
            (ws_c, wpost_c, wread_c, x) = carry
            h = x
            outs = []
            for w1, w2 in ws_c:
                h1 = jnp.maximum(
                    jnp.einsum(
                        "nkd,dh->nkh", h[:, :, : w1.shape[0]], w1,
                        preferred_element_type=jnp.bfloat16,
                    ),
                    0,
                )
                h2 = jnp.maximum(
                    jnp.einsum(
                        "nkh,ho->nko", h1, w2,
                        preferred_element_type=jnp.bfloat16,
                    ),
                    0,
                )
                h = jnp.concatenate([h2, h2], axis=-1)
                outs.append(h2.sum(1))
            cat = jnp.concatenate(
                outs + [x[:, 0, :13]], axis=-1
            )  # 4x256 conv outputs + the 13 raw input features
            post = jnp.maximum(cat[:, : wpost_c[0].shape[0]] @ wpost_c[0], 0)
            post = jnp.maximum(post @ wpost_c[1], 0)
            pooled = post.reshape(B, L, -1).max(1)
            out = jnp.concatenate([pooled] * 4, -1) @ wread_c
            loss = out.sum().astype(jnp.float32)
            x = x + 0.0 * loss.astype(x.dtype)
            return (ws_c, wpost_c, wread_c, x), loss

        emit(
            "matmul_floor",
            timed_scan(
                lambda c, b: mm_step(c, None), (ws, wpost, wread, x0), batch
            ),
        )


if __name__ == "__main__":
    main()
