"""Measure the ACTUAL reference DynEdge (executed from /root/reference via
tests/refshim) on this machine's CPU with the canonical training config.

This is the measured PyG-baseline anchor BASELINE.md demands ("the PyG
baseline must be measured by us on the reference code itself ... before any
comparison is claimed").  Prints one JSON line consumed by bench.py's
a100_pyg_estimate derivation (docs/architecture.md §2a).

Config matched to bench.py's headline shape: B=128 events, pulse counts
uniform in [0.5L, L] with L=128 (75% mean occupancy), canonical DynEdge
(k=8, [(128,256),(336,256)x3], pooling [min,max,mean,sum]) + Energy task,
Adam lr 1e-3 eps 1e-3 (`examples/04_training/01_train_dynedge.py:219-224`).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import torch

from tests import refshim


def build_batch(B=128, L=128, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(L // 2, L + 1, size=B)
    events = [
        np.concatenate(
            [
                rng.normal(size=(n, 3)).astype(np.float32),
                rng.normal(size=(n, 1)).astype(np.float32),
            ],
            axis=1,
        )
        for n in lengths
    ]
    import torch_cluster  # shim

    x = torch.from_numpy(np.concatenate(events, axis=0))
    batch = torch.cat(
        [
            torch.full((len(e),), i, dtype=torch.long)
            for i, e in enumerate(events)
        ]
    )
    edge_index = torch_cluster.knn_graph(x[:, :3], k=8, batch=batch)
    n_pulses = torch.tensor([len(e) for e in events], dtype=torch.float32)
    energy = torch.from_numpy(
        rng.uniform(1.0, 100.0, size=B).astype(np.float32)
    )
    return x, edge_index, batch, n_pulses, energy


def main():
    refshim.load_reference()
    from torch_geometric.data import Data

    from graphnet.models.gnn import DynEdge
    from graphnet.models.task.reconstruction import EnergyReconstruction
    from graphnet.training.loss_functions import LogCoshLoss

    torch.manual_seed(0)
    backbone = DynEdge(
        nb_inputs=4,
        global_pooling_schemes=["min", "max", "mean", "sum"],
    )
    task = EnergyReconstruction(
        hidden_size=128,
        target_labels="energy",
        loss_function=LogCoshLoss(),
    )
    backbone.train()
    task.train()
    opt = torch.optim.Adam(
        list(backbone.parameters()) + list(task.parameters()),
        lr=1e-3,
        eps=1e-3,
    )

    x, edge_index, batch, n_pulses, energy = build_batch()
    data = Data(x=x, edge_index=edge_index)
    data.batch = batch
    data.n_pulses = n_pulses
    data["energy"] = energy
    B = int(n_pulses.shape[0])

    def step():
        opt.zero_grad()
        preds = task(backbone(data))
        loss = task.compute_loss(preds, data)
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warmup
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = (time.perf_counter() - t0) / n_steps

    # component split via a second profiled step
    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU]) as prof:
        step()
    gemm_ops = {"aten::addmm", "aten::mm", "aten::linear", "aten::matmul"}
    knn_ops = {"aten::cdist", "aten::topk", "aten::sort"}
    total_us = gemm_us = knn_us = 0.0
    n_ops = 0
    for ev in prof.key_averages():
        t = ev.self_cpu_time_total
        total_us += t
        n_ops += ev.count
        if ev.key in gemm_ops:
            gemm_us += t
        elif ev.key in knn_ops:
            knn_us += t

    # hardware anchors for scaling the measurement to other machines:
    # achieved fp32 GEMM flops at the workload's dominant shape, and
    # achieved large-copy memory bandwidth.
    a = torch.randn(98304, 672)
    w = torch.randn(672, 336)
    a @ w  # warmup
    t0 = time.perf_counter()
    for _ in range(5):
        a @ w
    gemm_dt = (time.perf_counter() - t0) / 5
    cpu_gemm_gflops = 2 * 98304 * 672 * 336 / gemm_dt / 1e9

    src = torch.randn(64 * 1024 * 1024 // 4)  # 64 MB
    dst = torch.empty_like(src)
    dst.copy_(src)
    t0 = time.perf_counter()
    for _ in range(10):
        dst.copy_(src)
    copy_dt = (time.perf_counter() - t0) / 10
    cpu_copy_gbs = 2 * src.numel() * 4 / copy_dt / 1e9  # read+write

    print(
        json.dumps(
            {
                "ref_cpu_events_per_s": round(B / dt, 2),
                "ref_cpu_step_ms": round(dt * 1e3, 1),
                "batch": B,
                "gemm_fraction": round(gemm_us / total_us, 3),
                "knn_fraction": round(knn_us / total_us, 3),
                "n_ops_per_step": n_ops,
                "cpu_gemm_gflops": round(cpu_gemm_gflops, 1),
                "cpu_copy_gbs": round(cpu_copy_gbs, 1),
                "n_threads": torch.get_num_threads(),
                "note": "executed /root/reference DynEdge via tests/refshim; "
                "fwd+bwd+Adam, canonical config, B=128 L~U[64,128]",
            }
        )
    )


if __name__ == "__main__":
    main()
