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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


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
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "tests.tools_multiprocess_worker",
                str(pid),
                "2",
                str(port),
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
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

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
