"""Benchmark: DynEdge forward+backward events/s on one chip.

Canonical config (BASELINE.md): k=8, layer sizes [(128,256),(336,256)x3],
post [336,256], readout [128], pooling [min,max,mean,sum], batch 128.
Synthetic Prometheus-like events padded to L=128 (typical low-energy event
sizes), so the benchmark measures the pure compute path.

The reference publishes no numbers and torch_geometric is not installed
here, so ``vs_baseline`` is measured against an equivalent dense DynEdge
implemented in torch (CPU, this machine), cached in ``.bench_baseline.json``.
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

B = 128
L = 128
D = 4
K = 8
N_STEPS = 20


def _synthetic_batch(seed=0):
    from graphnet_tpu.batch import make_batch

    rng = np.random.default_rng(seed)
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
    return make_batch(events, labels=labels, length=L)


def bench_jax(compute_dtype=None) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    model = StandardModel(
        backbone=DynEdge(nb_inputs=D, compute_dtype=compute_dtype),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    batch = _synthetic_batch()
    batch = jax.device_put(batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    optimizer = optax.adam(1e-3, eps=1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return model.loss(model.apply(p, batch), batch.labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # chip-bound steady state: N_STEPS scanned inside one executable, so
    # per-step host dispatch (large on tunneled/remote runtimes) is
    # excluded — this is the number the chip actually sustains when the
    # input pipeline keeps it fed
    @jax.jit
    def steps(params, opt_state, batch):
        def one(carry, _):
            p, o = carry
            def loss_fn(p_):
                return model.loss(model.apply(p_, batch), batch.labels)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = optimizer.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=N_STEPS
        )
        return params, opt_state, losses[-1]

    # compile + warmup both variants
    params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    dt_dispatch = (time.perf_counter() - t0) / N_STEPS

    p2, o2, loss = steps(params, opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        p2, o2, loss = steps(p2, o2, batch)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / (reps * N_STEPS)

    events_per_s = B / dt
    n_edges = int(np.asarray(batch.mask).sum()) * K
    return {
        "events_per_s": events_per_s,
        "edges_per_s": events_per_s / B * n_edges,
        "step_ms": dt * 1e3,
        "per_dispatch_step_ms": dt_dispatch * 1e3,
        "backend": jax.default_backend(),
    }


def bench_torch_cpu_baseline(n_steps: int = 3) -> float:
    """Dense DynEdge equivalent in torch (CPU) — same shapes and math
    (EdgeConv MLPs, per-layer kNN, pooling), used as the vs_baseline
    denominator in lieu of an unavailable A100+PyG measurement."""
    import torch

    torch.manual_seed(0)
    x = torch.randn(B, L, D)
    mask = torch.ones(B, L, dtype=torch.bool)
    gv = 5 + D

    convs = torch.nn.ModuleList()
    d_in = D + gv
    for i, sizes in enumerate([(128, 256), (336, 256), (336, 256), (336, 256)]):
        layers = []
        prev = 2 * d_in
        for s in sizes:
            layers += [torch.nn.Linear(prev, s), torch.nn.ReLU()]
            prev = s
        convs.append(torch.nn.Sequential(*layers))
        d_in = sizes[-1]
    post = torch.nn.Sequential(
        torch.nn.Linear(D + gv + 4 * 256, 336),
        torch.nn.ReLU(),
        torch.nn.Linear(336, 256),
        torch.nn.ReLU(),
    )
    readout = torch.nn.Sequential(
        torch.nn.Linear(4 * 256, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 1),
    )
    params = (
        list(convs.parameters())
        + list(post.parameters())
        + list(readout.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-3, eps=1e-3)

    def knn(h):
        d2 = torch.cdist(h[..., :3], h[..., :3]) ** 2
        d2 += torch.eye(L)[None] * 1e9
        idx = d2.topk(K, largest=False).indices  # [B, L, K]
        return idx

    def forward():
        g = torch.cat(
            [x.mean(1), torch.zeros(B, 4), torch.log10(torch.full((B, 1), float(L)))],
            dim=1,
        )
        h = torch.cat([x, g[:, None, :].expand(B, L, gv)], dim=-1)
        idx = knn(x)
        skips = [h]
        for conv in convs:
            xj = torch.gather(
                h[:, :, None, :].expand(B, L, K, h.shape[-1]),
                1,
                idx[..., None].expand(B, L, K, h.shape[-1]),
            )
            xi = h[:, :, None, :].expand_as(xj)
            msg = conv(torch.cat([xi, xj - xi], dim=-1))
            h = msg.sum(2)
            idx = knn(h)
            skips.append(h)
        h = post(torch.cat(skips, dim=-1))
        pooled = torch.cat(
            [h.min(1).values, h.max(1).values, h.mean(1), h.sum(1)], dim=1
        )
        return readout(pooled)

    # warmup
    out = forward().sum()
    out.backward()
    opt.step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        opt.zero_grad()
        forward().sum().backward()
        opt.step()
    dt = time.perf_counter() - t0
    return B * n_steps / dt


def main() -> None:
    cache = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            baseline = json.load(f)["torch_cpu_events_per_s"]
    else:
        baseline = bench_torch_cpu_baseline()
        with open(cache, "w") as f:
            json.dump({"torch_cpu_events_per_s": baseline}, f)

    res = bench_jax(compute_dtype="bfloat16")
    # the fp32 comparison doubles compile time; opt-in via BENCH_FP32=1
    res_fp32 = (
        bench_jax(compute_dtype=None)
        if os.environ.get("BENCH_FP32") == "1"
        else None
    )
    print(
        json.dumps(
            {
                "metric": "dynedge_train_events_per_s_per_chip",
                "value": round(res["events_per_s"], 1),
                "unit": "events/s",
                "vs_baseline": round(res["events_per_s"] / baseline, 2),
                "detail": {
                    "edges_per_s": round(res["edges_per_s"], 0),
                    "step_ms": round(res["step_ms"], 2),
                    "per_dispatch_step_ms": round(
                        res["per_dispatch_step_ms"], 2
                    ),
                    "fp32_events_per_s": (
                        round(res_fp32["events_per_s"], 1)
                        if res_fp32
                        else None
                    ),
                    "batch": B,
                    "max_len": L,
                    "k": K,
                    "compute_dtype": "bfloat16 (params fp32)",
                    "backend": res["backend"],
                    "baseline": "equivalent dense DynEdge, torch CPU, "
                    "this machine",
                    "baseline_events_per_s": round(baseline, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
