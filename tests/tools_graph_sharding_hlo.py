"""Reproduce the graph-sharding collective analysis of
docs/architecture.md §4a: lower the DP×graph train step on the virtual
8-device mesh and report XLA-inserted collectives + all-gather volume.

Run: ``python -m tests.tools_graph_sharding_hlo`` (from the repo root).
Also imported by ``tests/test_multidevice.py`` as a structural check.
"""

import re
from typing import Dict, Tuple

import numpy as np


def analyze(
    B: int = 4,
    L: int = 1024,
    halo_hints: bool = True,
    compute_dtype=None,
) -> Tuple[Dict[str, int], float]:
    import jax

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.parallel.graph_sharding import (
        graph_sharding_hints,
        make_dp_graph_mesh,
        shard_batch_nodes,
    )
    from tests.test_multidevice import _batch, _model

    model = _model(
        backbone=DynEdge(nb_inputs=4, compute_dtype=compute_dtype)
    )
    batch = _batch(B=B, L=L, seed=7)
    mesh = make_dp_graph_mesh(2, 4)
    sharded = shard_batch_nodes(batch, mesh)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), batch),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )

    def loss_fn(p, b):
        return model.loss_from_batch(model.apply(p, b), b)

    def step(p, b):
        return jax.value_and_grad(loss_fn)(p, b)

    import contextlib

    ctx = (
        graph_sharding_hints(mesh)
        if halo_hints
        else contextlib.nullcontext()
    )
    with ctx:
        hlo = jax.jit(step).lower(params, sharded).compile().as_text()
    ops: Dict[str, int] = {}
    for m in re.finditer(
        r"(all-gather-start|all-gather|all-reduce|reduce-scatter"
        r"|collective-permute|all-to-all)[\.\w]*\(",
        hlo,
    ):
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
    ag_bytes = 0.0
    for m in re.finditer(
        r"\n\s*%?\S*\s*=\s*(\S+)\s+all-gather(?:-start)?", hlo
    ):
        shape = m.group(1)
        if "[" in shape:
            dims = re.findall(r"\d+", shape.split("[")[1].split("]")[0])
            if dims:
                n = int(np.prod([int(x) for x in dims]))
                ag_bytes += n * (2 if "bf16" in shape else 4)
    return ops, ag_bytes


if __name__ == "__main__":
    import os

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    for label, hints, cd in (
        ("no hints, fp32 (r2 baseline)", False, None),
        ("halo hints, fp32", True, None),
        ("halo hints, bf16 (production)", True, "bfloat16"),
    ):
        ops, ag_bytes = analyze(halo_hints=hints, compute_dtype=cd)
        print(f"[{label}] collectives (fwd+bwd):", ops)
        print(
            f"[{label}] all-gather result volume: "
            f"{ag_bytes / 1e6:.1f} MB/step"
        )
