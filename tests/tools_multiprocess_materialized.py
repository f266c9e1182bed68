"""Worker for the 2-process materialized-input test (see
``tests/test_multiprocess.py``): each process opens the SAME disk pack
with its own ``process_index`` shard (``data/materialized.py``), takes
its first batch as the host-local slice of a global batch, and runs one
DP train step over a global mesh — the multi-host production input path
(pack once, every host replays its shard) end to end.

Two modes:
  * ``step`` — one hand-rolled DP train step (global-loss parity);
  * ``fit``  — a full 2-epoch ``Trainer.fit(mesh=...)`` over the shard
    (the Trainer's multi-host batch assembly,
    ``trainer.py::_shard_batch``), printing the loss history and a
    parameter checksum.

Run (from the repo root, once per process):
    python -m tests.tools_multiprocess_materialized <pid> <nprocs> <port> <pack_dir> [step|fit]
"""

import os
import sys


def main() -> None:
    pid, nprocs, port, pack_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from graphnet_tpu.data.materialized import MaterializedLoader
    from graphnet_tpu.parallel.distributed import (
        init_distributed,
        shard_host_local,
    )

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs

    import jax.numpy as jnp
    import numpy as np
    import optax

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.parallel.mesh import make_mesh, replicated
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    def build_model():
        return StandardModel(
            backbone=DynEdge(
                nb_inputs=4,
                dynedge_layer_sizes=((16, 16), (16, 16)),
                post_processing_layer_sizes=(16,),
                readout_layer_sizes=(16,),
            ),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                    transform_prediction_and_target=lambda t: jnp.log10(
                        t
                    ),
                ),
            ),
        )

    # "_fsdp" suffix: params/opt-state sharded over the global data
    # axis — exercises multi-host sharded-state checkpointing (orbax
    # global-array save/restore) and FSDP training across processes
    sharding = "replicated"
    if mode.endswith("_fsdp"):
        sharding = "fsdp"
        mode = mode[: -len("_fsdp")]

    if mode in ("fit", "fitval", "fitresume"):
        from graphnet_tpu.training.trainer import Trainer

        def make_shard():
            return MaterializedLoader(
                pack_dir,
                shuffle=True,
                seed=5,
                process_index=pid,
                process_count=nprocs,
                to_device=False,
            )

        shard = make_shard()
        mesh = make_mesh(n_data=len(jax.devices()))
        if mode == "fitresume":
            # epoch 0 under checkpointing with the SAME max_epochs as
            # the uninterrupted run (the default LR schedule depends on
            # max_epochs), "preempted" right after the epoch-0 snapshot
            # is written; then a FRESH trainer+loader resumes to epoch
            # 2 — multi-host preemption recovery
            ckpt = os.path.join(pack_dir, "ckpt")

            class _Preempt(Exception):
                pass

            class _PreemptAfterEpochEnd:
                # epoch-end metrics carry events_per_s; raising there
                # kills the run between the checkpoint save and the
                # next epoch, like a real preemption
                def log(self, metrics, step=None):
                    if "events_per_s" in metrics:
                        raise _Preempt()

            first = Trainer(
                build_model(),
                mesh=mesh,
                learning_rate=1e-3,
                checkpoint_dir=ckpt,
                param_sharding=sharding,
                metric_logger=_PreemptAfterEpochEnd(),
            )
            try:
                first.fit(shard, max_epochs=2)
                raise AssertionError("preemption never fired")
            except _Preempt:
                pass
            trainer = Trainer(
                build_model(),
                mesh=mesh,
                learning_rate=1e-3,
                checkpoint_dir=ckpt,
                param_sharding=sharding,
            )
            history = trainer.fit(
                make_shard(), max_epochs=2, resume=True
            )
        else:
            trainer = Trainer(
                build_model(),
                mesh=mesh,
                learning_rate=1e-3,
                param_sharding=sharding,
            )
            # "fitval": validation also runs over a per-process shard —
            # eval losses are replicated global scalars, so every host
            # logs the same val_loss and early stopping stays in
            # lockstep
            val = make_shard() if mode == "fitval" else None
            history = trainer.fit(shard, val, max_epochs=2)
        losses = ",".join(
            f"{v:.8f}" for v in history["train_loss"]
        )
        if history.get("val_loss"):
            losses += ";" + ",".join(
                f"{v:.8f}" for v in history["val_loss"]
            )
        checksum = float(
            sum(
                float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(
                    trainer.state.params
                )
            )
        )
        print(
            f"RESULT pid={pid} losses={losses} "
            f"checksum={checksum:.6f}",
            flush=True,
        )
        jax.distributed.shutdown()
        return

    if mode == "predict":
        from graphnet_tpu.training.trainer import Trainer

        shard = MaterializedLoader(
            pack_dir,
            shuffle=False,
            process_index=pid,
            process_count=nprocs,
            to_device=False,
        )
        mesh = make_mesh(n_data=len(jax.devices()))
        trainer = Trainer(build_model(), mesh=mesh)
        preds = trainer.predict(shard)
        arr = preds[0]
        print(
            f"RESULT pid={pid} shape={arr.shape[0]}x{arr.shape[1]} "
            f"sum={float(np.sum(arr)):.8f}",
            flush=True,
        )
        jax.distributed.shutdown()
        return

    # this host's shard of the shared pack; to_device=False yields host
    # numpy (the local batch becomes a slice of the GLOBAL array below
    # — no device_put and no D2H readback, which on tunneled runtimes
    # would degrade every later transfer)
    shard = MaterializedLoader(
        pack_dir,
        shuffle=False,
        process_index=pid,
        process_count=nprocs,
        to_device=False,
    )
    local = None
    for batch in shard:
        local = batch
        break
    assert local is not None
    assert isinstance(local.x, np.ndarray)

    mesh = make_mesh(n_data=len(jax.devices()))
    gbatch = shard_host_local(local, mesh)
    B_local = local.x.shape[0]
    assert gbatch.x.shape[0] == B_local * nprocs

    model = build_model()
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), gbatch), replicated(mesh)
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

    params, opt_state, loss = step(params, opt_state, gbatch)
    key = int(np.asarray(local.n_pulses).sum())
    print(
        f"RESULT pid={pid} loss={float(loss):.8f} shardkey={key}",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
