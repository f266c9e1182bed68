"""Worker for the 2-process jax.distributed test (see
``tests/test_multiprocess.py``): each process owns 4 virtual CPU devices,
assembles its host-local slice of a deterministic global batch into a
globally-sharded array, and runs one DP train step — the exact multi-host
code path of ``parallel/distributed.py``.

Run (from the repo root, once per process):
    python -m tests.tools_multiprocess_worker <pid> <nprocs> <port>
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

    from graphnet_tpu.parallel.distributed import (
        host_local_batch_slice,
        init_distributed,
        shard_host_local,
    )

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    import numpy as np

    import jax.numpy as jnp
    import optax

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.parallel.mesh import make_mesh, replicated
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    # deterministic GLOBAL batch, identical on every process
    B, L, D = 16, 24, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    mask = np.ones((B, L), bool)
    energy = np.abs(
        rng.standard_normal(B).astype(np.float32) * 100 + 200
    )

    # this process contributes only its local slice
    start, size = host_local_batch_slice(B)
    local = EventBatch(
        x=x[start : start + size],
        mask=mask[start : start + size],
        n_pulses=np.full((size,), L, np.int32),
        labels={"total_energy": energy[start : start + size]},
    )
    mesh = make_mesh(n_data=len(jax.devices()))
    batch = shard_host_local(local, mesh)
    assert batch.x.shape[0] == B  # global shape

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
        model.init(jax.random.PRNGKey(0), batch), replicated(mesh)
    )
    optimizer = optax.adam(1e-3, eps=1e-3)
    opt_state = jax.device_put(optimizer.init(params), replicated(mesh))

    @jax.jit
    def step(p, s, b):
        def loss_fn(pp):
            return model.loss_from_batch(model.apply(pp, b), b)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss = step(params, opt_state, batch)
    # every process sees the same replicated global loss
    print(f"RESULT pid={pid} loss={float(loss):.8f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
