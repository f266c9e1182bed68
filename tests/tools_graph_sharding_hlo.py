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


def analyze_tpu_aot(
    B: int = 4,
    L: int = 1024,
    topology: str = "v5e:2x4",
    mesh_shape: Tuple[int, int] = (2, 4),
):
    """AOT-compile the DP×graph train step for a REAL multi-chip TPU
    topology — no TPU devices needed (libtpu AOT via
    ``jax.experimental.topologies``) — and report how XLA scheduled the
    halo all-gathers (VERDICT r3 item 5: are the 6.6 MB/step exchanges
    async, overlapping compute?).

    The post-optimization HLO re-merges async pairs but records the
    split in ``frontend_attributes={async_collective_name=
    "all-gather-start..."}`` — an all-gather carrying that attribute was
    made asynchronous by the latency-hiding scheduler.

    Returns a dict with: total all-gather count, async count, the
    async-scheduled halo gathers' op names, and all-gather volume.
    """
    import re as _re

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import (
        EnergyReconstruction,
    )
    from graphnet_tpu.parallel.graph_sharding import graph_sharding_hints
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topology
    )
    devs = np.asarray(topo.devices).reshape(*mesh_shape)
    mesh = Mesh(devs, axis_names=("data", "graph"))

    rng = np.random.default_rng(0)
    batch_np = EventBatch(
        x=rng.standard_normal((B, L, 4)).astype(np.float32),
        mask=np.ones((B, L), bool),
        n_pulses=np.full((B,), L, np.int32),
        labels={
            "total_energy": np.abs(
                rng.standard_normal(B).astype(np.float32) * 100 + 200
            )
        },
    )
    model = StandardModel(
        backbone=DynEdge(nb_inputs=4, compute_dtype="bfloat16"),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda x: jnp.log10(x),
            ),
        ),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jax.tree_util.tree_map(jnp.asarray, batch_np),
    )
    batch_specs = EventBatch(
        x=P("data", "graph", None),
        mask=P("data", "graph"),
        n_pulses=P("data"),
        labels={"total_energy": P("data")},
    )
    batch_sds = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(
            np.shape(a),
            np.asarray(a).dtype,
            sharding=NamedSharding(mesh, s),
        ),
        batch_np,
        batch_specs,
    )
    params_sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a),
            np.asarray(a).dtype,
            sharding=NamedSharding(mesh, P()),
        ),
        params,
    )

    def loss_fn(p, b):
        return model.loss_from_batch(model.apply(p, b), b)

    def step(p, b):
        return jax.value_and_grad(loss_fn)(p, b)

    with graph_sharding_hints(mesh):
        hlo = (
            jax.jit(step).lower(params_sds, batch_sds).compile().as_text()
        )

    ags = _re.findall(r"= (\S+) all-gather\(([^\n]*)", hlo)
    n_async = 0
    async_halo = []
    ag_bytes = 0.0
    for shape, rest in ags:
        if "[" in shape:
            dims = _re.findall(r"\d+", shape.split("[")[1].split("]")[0])
            if dims:
                n = int(np.prod([int(x) for x in dims]))
                ag_bytes += n * (2 if shape.startswith("bf16") else 4)
        if "async_collective_name" in rest:
            n_async += 1
            m = _re.search(r'op_name="([^"]*)"', rest)
            if m and "backbone" in m.group(1):
                async_halo.append(m.group(1))
    return {
        "n_all_gather": len(ags),
        "n_async": n_async,
        "async_backbone_gathers": async_halo,
        "all_gather_mb": ag_bytes / 1e6,
    }


