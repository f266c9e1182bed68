"""Worker for the 2-process GRAPH-AXIS sharding test (VERDICT r3 item 5).

Unlike ``tools_multiprocess_worker`` (DP over the batch axis), this worker
builds the ``(data, graph)`` mesh TRANSPOSED across processes — mesh entry
``[d, g]`` is local device ``d`` of process ``g`` — so the intra-event
node axis is split BETWEEN the two processes and every halo exchange of
the EdgeConv/kNN path (parallel/graph_sharding.py) rides a cross-process
collective, the pattern a real multi-host TPU slice would execute over
ICI/DCN.

Each process contributes only its node-axis half of the global batch via
``jax.make_array_from_process_local_data``, runs one graph-sharded train
step under ``graph_sharding_hints``, and prints the replicated loss.

Run (from the repo root, once per process):
    python -m tests.tools_multiprocess_graph <pid> <nprocs> <port>
"""

import os
import sys


def main() -> None:
    pid, nprocs, port = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from graphnet_tpu.parallel.distributed import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs

    import numpy as np

    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.parallel.graph_sharding import graph_sharding_hints
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    n_local = 4
    devices = jax.devices()
    assert len(devices) == n_local * nprocs
    # TRANSPOSED mesh: graph axis indexes the PROCESS, so node-axis
    # halves live on different hosts and halo exchanges cross processes
    arr = np.asarray(devices).reshape(nprocs, n_local).T  # [data, graph]
    mesh = Mesh(arr, axis_names=("data", "graph"))

    # deterministic GLOBAL batch, identical on every process
    B, L, D = 8, 32, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = rng.integers(L // 2, L + 1, size=B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(bool)
    energy = np.abs(
        rng.standard_normal(B).astype(np.float32) * 100 + 200
    )

    half = L // nprocs
    lo = pid * half

    def from_local(spec, local):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local
        )

    batch = EventBatch(
        x=from_local(P("data", "graph", None), x[:, lo : lo + half]),
        mask=from_local(P("data", "graph"), mask[:, lo : lo + half]),
        n_pulses=from_local(
            P("data"), lengths.astype(np.int32)
        ),
        labels={"total_energy": from_local(P("data"), energy)},
    )
    assert batch.x.shape == (B, L, D)  # global shape

    model = StandardModel(
        backbone=DynEdge(
            nb_inputs=D,
            dynedge_layer_sizes=((16, 16), (16, 16)),
            post_processing_layer_sizes=(16,),
            readout_layer_sizes=(16,),
        ),
        tasks=(
            EnergyReconstruction(
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
                transform_prediction_and_target=lambda t: jnp.log10(t),
            ),
        ),
    )
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), batch),
        NamedSharding(mesh, P()),
    )
    optimizer = optax.adam(1e-3, eps=1e-3)
    opt_state = jax.device_put(
        optimizer.init(params), NamedSharding(mesh, P())
    )

    @jax.jit
    def step(p, s, b):
        def loss_fn(pp):
            return model.loss_from_batch(model.apply(pp, b), b)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    with graph_sharding_hints(mesh):
        params, opt_state, loss = step(params, opt_state, batch)
    print(f"RESULT pid={pid} loss={float(loss):.8f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
