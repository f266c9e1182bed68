"""Scaling-efficiency model + the n=16 dryrun (VERDICT r4 item 5).

Real multi-chip hardware is unreachable here, so the multi-chip story
is (a) an analytic efficiency model priced from the AOT-compiled v5e
HLO's collective volumes and public ICI bandwidth
(``graphnet_tpu/parallel/scaling_model.py``), and (b) a 16-virtual-
device dryrun that exercises the 4-way graph axis (ring halos, shard
divisibility) the 8-device mesh cannot.

Reference scaling surface: Lightning DDP in
``/root/reference/src/graphnet/models/standard_model.py`` (NCCL
gradient buckets) — the TPU design replaces it with GSPMD collectives
over an ICI mesh; SURVEY.md §2.6.
"""

import os
import subprocess
import sys

import pytest

from graphnet_tpu.parallel.scaling_model import (
    CollectiveProfile,
    ICI_LINK_GBPS,
    dynedge_headline_profile,
    predict_scaling,
)

# measured band of the single-chip bench headline (README.md): the
# model must clear the north star at the PESSIMISTIC end of the band
STEP_MS_BAND = (4.78, 5.62)
# DynEdge headline param count (measured once via model.init on the
# canonical bench config; pinned so the formula tests are hermetic —
# test_param_count_pin_is_current re-derives it from the live model)
DYNEDGE_PARAMS = 1_378_769


class TestRingFormulas:
    def test_allreduce_scales_with_axis(self):
        p = CollectiveProfile(grad_allreduce_bytes=4e6)
        t2 = predict_scaling(5.0, p, n_data=2).t_allreduce_ms
        t8 = predict_scaling(5.0, p, n_data=8).t_allreduce_ms
        # ring all-reduce: 2*(n-1)/n * B/bw -> approaches 2*B/bw
        assert t2 == pytest.approx(1.0 * 4e6 / 50e9 * 1e3)
        assert t8 == pytest.approx(2 * 7 / 8 * 4e6 / 50e9 * 1e3)
        assert t8 < 2 * t2  # saturates, never linear in n

    def test_single_chip_is_free(self):
        p = CollectiveProfile(
            grad_allreduce_bytes=4e6, halo_allgather_bytes=1e7
        )
        pred = predict_scaling(5.0, p, n_data=1, n_graph=1)
        assert pred.efficiency_expected == 1.0
        assert pred.t_allreduce_ms == 0.0
        assert pred.t_halo_ms == 0.0

    def test_conservative_never_beats_expected(self):
        p = CollectiveProfile(
            grad_allreduce_bytes=4e6, halo_allgather_bytes=6.6e6
        )
        pred = predict_scaling(5.0, p, n_data=4, n_graph=4)
        assert (
            pred.efficiency_conservative <= pred.efficiency_expected <= 1.0
        )

    def test_sync_halo_is_priced(self):
        fast = predict_scaling(
            5.0,
            CollectiveProfile(4e6, 6.6e6, halo_async=True),
            n_data=2,
            n_graph=4,
        )
        slow = predict_scaling(
            5.0,
            CollectiveProfile(4e6, 6.6e6, halo_async=False),
            n_data=2,
            n_graph=4,
        )
        assert slow.efficiency_expected < fast.efficiency_expected


class TestHeadlinePredictions:
    """The claims docs/architecture.md §4b publishes, re-derived."""

    @pytest.mark.parametrize("mesh", [(8, 1), (2, 4), (4, 4), (16, 1)])
    def test_efficiency_clears_north_star(self, mesh):
        n_data, n_graph = mesh
        profile = dynedge_headline_profile(DYNEDGE_PARAMS)
        # the DP-only headline has no graph axis; give the DPxgraph
        # meshes the AOT-measured halo volume (6.6 MB/step at B=4
        # L=1024, test_graph_sharding_tpu_hlo.py)
        if n_graph > 1:
            profile.halo_allgather_bytes = 6.6e6
        pred = predict_scaling(
            STEP_MS_BAND[1],  # pessimistic end of the measured band
            profile,
            n_data=n_data,
            n_graph=n_graph,
            events_per_step=128,
        )
        assert pred.efficiency_expected >= 0.95
        assert pred.efficiency_conservative >= 0.85, (
            f"{mesh}: conservative efficiency "
            f"{pred.efficiency_conservative:.3f} below the 0.85 north "
            f"star (allreduce {pred.t_allreduce_ms:.3f} ms, halo "
            f"{pred.t_halo_ms:.3f} ms)"
        )

    def test_aggregate_throughput_16_chips(self):
        pred = predict_scaling(
            STEP_MS_BAND[1],
            dynedge_headline_profile(DYNEDGE_PARAMS),
            n_data=16,
            events_per_step=128,
        )
        # 16 chips at >=95% of the 22.7k-ev/s pessimistic single-chip
        # mode is >=345k events/s
        assert pred.events_per_s_expected > 3.45e5

    def test_param_count_pin_is_current(self):
        """Re-derive the pinned DynEdge param count from the actual
        bench-headline model so the prediction inputs can't drift."""
        import jax
        import numpy as np

        import jax.numpy as jnp

        import bench
        from graphnet_tpu.models.gnn.dynedge import DynEdge
        from graphnet_tpu.models.standard_model import StandardModel
        from graphnet_tpu.models.task.reconstruction import (
            EnergyReconstruction,
        )
        from graphnet_tpu.training.loss_functions import LogCoshLoss

        model = StandardModel(
            backbone=DynEdge(nb_inputs=bench.D, compute_dtype="bfloat16"),
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                    transform_prediction_and_target=lambda x: jnp.log10(x),
                ),
            ),
        )
        batch = bench._synthetic_batch(seed=0, batch_size=2)
        params = model.init(jax.random.PRNGKey(0), batch)
        n = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params)
        )
        # tasks add a few thousand head params; the backbone dominates
        assert abs(n - DYNEDGE_PARAMS) / DYNEDGE_PARAMS < 0.05, n


@pytest.mark.slow
def test_dryrun_multichip_16_devices():
    """dryrun_multichip(16) on a 16-virtual-device CPU platform: the
    4-way graph axis (4x4-style topology) must shard, compile, and
    step finitely — run in a subprocess because the test session's
    platform is pinned to 8 devices at init."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(16)",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "dryrun_multichip(16): DP step OK" in out.stdout
    assert "DPxGRAPH 4x4 step OK" in out.stdout
