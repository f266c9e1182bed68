"""Real multi-process jax.distributed test (2 processes × 4 virtual CPU
devices): the multi-host controller path of ``parallel/distributed.py``
that single-process tests cannot reach (VERDICT r1 §2.6 row 4).

Verifies: distributed init, global-array assembly from per-process local
slices, one DP train step with XLA-inserted cross-process collectives,
and that both processes observe the *same* global loss, equal to the
single-process value on the same global batch.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_pair(module: str, *args: str, timeout: int = 540):
    """Launch 2 coordinated jax.distributed worker processes of
    ``module`` and return their stdouts (asserting clean exits)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                module,
                str(pid),
                "2",
                str(port),
                *args,
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return outs


def _fit_results(pack: str, mode: str):
    """Run the materialized worker in a fit-family mode; parse
    (train_losses, val_losses, checksum) per process."""
    outs = _launch_pair(
        "tests.tools_multiprocess_materialized", pack, mode
    )
    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d+) losses=([-\d.,;]+) checksum=([-\d.]+)",
            out,
        )
        assert m, f"no RESULT line in:\n{out}"
        parts = m.group(2).split(";")
        results[int(m.group(1))] = (
            [float(v) for v in parts[0].split(",")],
            [float(v) for v in parts[1].split(",")]
            if len(parts) > 1
            else [],
            float(m.group(3)),
        )
    assert set(results) == {0, 1}
    return results


def _single_process_loss() -> float:
    """Same model/batch/step on the in-test 8-device platform."""
    import jax
    import jax.numpy as jnp
    import optax

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    B, L, D = 16, 24, 4
    rng = np.random.default_rng(0)
    batch = EventBatch(
        x=jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32),
        mask=jnp.ones((B, L), bool),
        n_pulses=jnp.full((B,), L, jnp.int32),
        labels={
            "total_energy": jnp.abs(
                jnp.asarray(
                    rng.standard_normal(B), jnp.float32
                )
                * 100
                + 200
            )
        },
    )
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
    params = model.init(jax.random.PRNGKey(0), batch)
    loss = model.loss_from_batch(model.apply(params, batch), batch)
    return float(loss)


def test_two_process_dp_step_matches_single_process():
    outs = _launch_pair("tests.tools_multiprocess_worker")
    losses = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d+) loss=([-\d.]+)", out)
        assert m, f"no RESULT line in:\n{out}"
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    # both processes observe the identical replicated global loss
    assert losses[0] == losses[1], losses
    # and it matches the single-process computation on the global batch
    ref = _single_process_loss()
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5)


def _pack_batches(path, n=4):
    """``n`` deterministic same-shape batches packed to disk; returns
    the batches (host numpy) keyed for shard identification."""
    import jax

    from graphnet_tpu.batch import make_batch
    from graphnet_tpu.data.materialized import materialize

    rng = np.random.default_rng(3)
    batches = []
    for i in range(n):
        events = [
            rng.standard_normal((12 + (i + j) % 5, 4)).astype(
                np.float32
            )
            for j in range(8)
        ]
        batches.append(
            make_batch(
                events,
                labels={
                    "total_energy": np.abs(
                        rng.standard_normal(8).astype(np.float32)
                    )
                    * 100
                    + 200
                },
                length=24,
            )
        )

    class _L:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    materialize(_L(), path)
    return [
        jax.tree_util.tree_map(np.asarray, b) for b in batches
    ]


def _expected_materialized_loss(b_lo, b_hi) -> float:
    """Single-process loss on the concatenation of the two shard
    batches (process 0's slice first)."""
    import jax
    import jax.numpy as jnp

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    cat = lambda a, b: np.concatenate([a, b], axis=0)  # noqa: E731
    batch = EventBatch(
        x=cat(b_lo.x, b_hi.x),
        mask=cat(b_lo.mask, b_hi.mask),
        n_pulses=cat(b_lo.n_pulses, b_hi.n_pulses),
        labels={
            "total_energy": cat(
                b_lo.labels["total_energy"],
                b_hi.labels["total_energy"],
            )
        },
    )
    model = StandardModel(
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
                transform_prediction_and_target=lambda t: jnp.log10(t),
            ),
        ),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    return float(
        model.loss_from_batch(model.apply(params, batch), batch)
    )


def test_two_process_materialized_shards_match_single_process(tmp_path):
    """Production multi-host input path: both processes replay disjoint
    shards of one disk pack, assemble the global batch, and agree with
    the single-process loss on the same events."""
    pack = str(tmp_path / "pack")
    batches = _pack_batches(pack)
    outs = _launch_pair("tests.tools_multiprocess_materialized", pack)
    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d+) loss=([-\d.]+) shardkey=(\d+)", out
        )
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (
            float(m.group(2)),
            int(m.group(3)),
        )
    assert set(results) == {0, 1}
    # same replicated global loss on both processes
    assert results[0][0] == results[1][0], results
    # shards were DISJOINT: shuffle=False over 4 batches → process 0
    # reads batch 0, process 1 reads batch 2
    keys = {
        int(np.asarray(b.n_pulses).sum()): i
        for i, b in enumerate(batches)
    }
    assert keys[results[0][1]] == 0
    assert keys[results[1][1]] == 2
    ref = _expected_materialized_loss(batches[0], batches[2])
    np.testing.assert_allclose(results[0][0], ref, rtol=1e-5)


def test_two_process_trainer_fit_over_materialized_shards(tmp_path):
    """Trainer.fit runs multi-host end to end: each process feeds its
    shape-aligned MaterializedLoader shard, _shard_batch assembles the
    global batch via make_array_from_process_local_data, and both
    processes converge to identical params — matching a single-process
    mesh run over the equivalent global batch stream."""
    pack = str(tmp_path / "pack")
    _pack_batches(pack)
    results = _fit_results(pack, "fit")
    # identical loss history and final params on both processes
    assert results[0] == results[1], results
    assert len(results[0][0]) == 2
    assert all(np.isfinite(v) for v in results[0][0])

    # single-process reference: the same global batch stream (concat of
    # the two shards per step — same seed => same shared schedule) on
    # the in-test 8-device mesh
    import jax

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.data.materialized import MaterializedLoader
    from graphnet_tpu.parallel.mesh import make_mesh
    from graphnet_tpu.training.trainer import Trainer

    class GlobalStream:
        def __init__(self):
            self.shards = [
                MaterializedLoader(
                    pack,
                    shuffle=True,
                    seed=5,
                    process_index=i,
                    process_count=2,
                    to_device=False,
                )
                for i in range(2)
            ]

        def __len__(self):
            return len(self.shards[0])

        def __iter__(self):
            for b0, b1 in zip(*self.shards):
                cat = lambda a, b: np.concatenate(  # noqa: E731
                    [np.asarray(a), np.asarray(b)], axis=0
                )
                yield EventBatch(
                    x=cat(b0.x, b1.x),
                    mask=cat(b0.mask, b1.mask),
                    n_pulses=cat(b0.n_pulses, b1.n_pulses),
                    labels={
                        k: cat(v, b1.labels[k])
                        for k, v in b0.labels.items()
                    },
                )

    import jax.numpy as jnp

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    model = StandardModel(
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
                transform_prediction_and_target=lambda t: jnp.log10(t),
            ),
        ),
    )
    mesh = make_mesh(n_data=len(jax.devices()))
    trainer = Trainer(model, mesh=mesh, learning_rate=1e-3)
    ref = trainer.fit(GlobalStream(), max_epochs=2)
    np.testing.assert_allclose(
        results[0][0], ref["train_loss"], rtol=1e-5
    )


def test_two_process_predict_returns_local_rows(tmp_path):
    """Multi-host predict: each process receives predictions for exactly
    its shard's events, equal to a single-process predict on the same
    batches."""
    pack = str(tmp_path / "pack")
    _pack_batches(pack)
    outs = _launch_pair(
        "tests.tools_multiprocess_materialized", pack, "predict"
    )
    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d+) shape=(\d+)x(\d+) sum=([-\d.]+)", out
        )
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (
            int(m.group(2)),
            int(m.group(3)),
            float(m.group(4)),
        )
    assert set(results) == {0, 1}
    # 4 batches of 8 events, one shape group: 2 batches (16 events) each
    assert results[0][:2] == (16, 1)
    assert results[1][:2] == (16, 1)

    # single-process reference per shard (same params: same PRNG seed,
    # shape-independent init)
    from graphnet_tpu.data.materialized import MaterializedLoader
    from graphnet_tpu.training.trainer import Trainer

    import jax.numpy as jnp

    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    for pid in (0, 1):
        model = StandardModel(
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
        shard = MaterializedLoader(
            pack,
            shuffle=False,
            process_index=pid,
            process_count=2,
            to_device=False,
        )
        ref = Trainer(model).predict(shard)[0]
        assert ref.shape == (16, 1)
        np.testing.assert_allclose(
            results[pid][2], float(np.sum(ref)), rtol=1e-5
        )


def test_two_process_checkpoint_resume(tmp_path):
    """Multi-host preemption recovery: collective orbax snapshot (every
    process calls save — a process-0-only save deadlocks on
    sync_global_devices, see CLAUDE.md), a simulated kill right after
    the epoch-0 checkpoint, fresh trainers+loaders resume at epoch 1,
    and (set_epoch) the resumed epoch replays the exact uninterrupted
    batch order — identical epoch-1 loss and final params.  6 batches
    (3 steps/epoch/shard) so the default LR schedule's s/2 knot falls
    strictly inside the epoch — a schedule mismatch between the two
    runs cannot cancel out."""
    pack_a = str(tmp_path / "pack_a")
    _pack_batches(pack_a, n=6)
    straight = _fit_results(pack_a, "fit")
    pack_b = str(tmp_path / "pack_b")
    _pack_batches(pack_b, n=6)
    resumed = _fit_results(pack_b, "fitresume")

    # cross-process identity in both runs
    assert straight[0] == straight[1]
    assert resumed[0] == resumed[1]
    # resumed history = [epoch-1 loss] only (epoch 0 ran pre-"preemption")
    assert len(resumed[0][0]) == 1
    assert len(straight[0][0]) == 2
    np.testing.assert_allclose(
        resumed[0][0][0], straight[0][0][1], rtol=1e-6
    )
    np.testing.assert_allclose(
        resumed[0][2], straight[0][2], rtol=1e-6
    )


def test_two_process_fsdp_checkpoint_resume(tmp_path):
    """Multi-host SHARDED-state checkpointing (orbax global-array
    path): params/opt-state are FSDP-sharded over the global data axis
    — save writes each process's addressable shards, restore reads them
    straight back into the sharded layout.  Same preempt-at-epoch-0 /
    resume-to-epoch-2 protocol as the replicated test; resumed run must
    match the uninterrupted one exactly."""
    pack_a = str(tmp_path / "pack_a")
    _pack_batches(pack_a, n=6)
    straight = _fit_results(pack_a, "fit_fsdp")
    pack_b = str(tmp_path / "pack_b")
    _pack_batches(pack_b, n=6)
    resumed = _fit_results(pack_b, "fitresume_fsdp")

    assert straight[0] == straight[1]
    assert resumed[0] == resumed[1]
    assert len(resumed[0][0]) == 1
    assert len(straight[0][0]) == 2
    np.testing.assert_allclose(
        resumed[0][0][0], straight[0][0][1], rtol=1e-6
    )
    np.testing.assert_allclose(
        resumed[0][2], straight[0][2], rtol=1e-6
    )


def test_two_process_validation_in_lockstep(tmp_path):
    """Multi-host validation: each host feeds its val shard, the eval
    loss is a replicated global scalar — identical val history on every
    process (early stopping can never diverge across hosts)."""
    pack = str(tmp_path / "pack")
    _pack_batches(pack)
    results = _fit_results(pack, "fitval")
    assert results[0] == results[1]
    train, val, _ = results[0]
    assert len(train) == 2 and len(val) == 2
    assert all(np.isfinite(v) for v in train + val)


def test_two_process_graph_axis_step_matches_single_process():
    """Graph (node-axis) sharding ACROSS process boundaries (VERDICT r3
    item 5): the ``(data, graph)`` mesh is transposed so each process
    owns one node-axis half of every event, making all EdgeConv/kNN halo
    exchanges cross-process collectives.  Both processes must observe the
    identical replicated loss, equal to the unsharded single-process
    value on the same global batch."""
    outs = _launch_pair("tests.tools_multiprocess_graph")
    losses = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d+) loss=([-\d.]+)", out)
        assert m, f"no RESULT line in:\n{out}"
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    assert losses[0] == losses[1], losses

    # unsharded single-process reference on the same global batch
    import jax
    import jax.numpy as jnp

    from graphnet_tpu.batch import EventBatch
    from graphnet_tpu.models.gnn.dynedge import DynEdge
    from graphnet_tpu.models.standard_model import StandardModel
    from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
    from graphnet_tpu.training.loss_functions import LogCoshLoss

    B, L, D = 8, 32, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = rng.integers(L // 2, L + 1, size=B)
    mask = np.arange(L)[None, :] < lengths[:, None]
    energy = np.abs(
        rng.standard_normal(B).astype(np.float32) * 100 + 200
    )
    batch = EventBatch(
        x=jnp.asarray(x),
        mask=jnp.asarray(mask),
        n_pulses=jnp.asarray(lengths.astype(np.int32)),
        labels={"total_energy": jnp.asarray(energy)},
    )
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
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = float(model.loss_from_batch(model.apply(params, batch), batch))
    assert abs(losses[0] - ref) < 1e-4 * max(1.0, abs(ref)), (
        losses,
        ref,
    )
