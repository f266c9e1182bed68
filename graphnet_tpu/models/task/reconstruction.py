"""Reconstruction task heads (mirror of reference
``src/graphnet/models/task/reconstruction.py``)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from graphnet_tpu.models.task.task import EPS, StandardLearnedTask

Array = jax.Array


class AzimuthReconstructionWithKappa(StandardLearnedTask):
    """(x, y) head → azimuth in [0, 2π) + κ = |v| (reference ``:11-26``)."""

    task_nb_inputs = 2
    default_target_labels = ("azimuth",)
    default_prediction_labels = ("azimuth_pred", "azimuth_kappa")

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        kappa = jnp.linalg.norm(x, axis=1) + EPS
        angle = jnp.arctan2(x[:, 1], x[:, 0])
        angle = jnp.where(angle < 0, angle + 2 * jnp.pi, angle)
        return jnp.stack([angle, kappa], axis=1), jnp.float32(0.0)


class AzimuthReconstruction(AzimuthReconstructionWithKappa):
    """Azimuth only, with KL regulariser on σ² = 1/κ (reference ``:29-46``)."""

    default_prediction_labels = ("azimuth_pred",)

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        res, _ = super()._forward(x)
        angle = res[:, :1]
        kappa = res[:, 1]
        sigma = jnp.sqrt(1.0 / kappa)
        beta = 1e-3
        kl_loss = jnp.mean(sigma**2 - jnp.log(sigma) - 1.0)
        return angle, beta * kl_loss


class DirectionReconstructionWithKappa(StandardLearnedTask):
    """3D unit direction + κ for vMF (reference ``:49-70``)."""

    task_nb_inputs = 3
    default_target_labels = ("direction",)
    default_prediction_labels = (
        "dir_x_pred",
        "dir_y_pred",
        "dir_z_pred",
        "direction_kappa",
    )

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        kappa = jnp.linalg.norm(x, axis=1) + EPS
        vec = x / kappa[:, None]
        return (
            jnp.concatenate([vec, kappa[:, None]], axis=1),
            jnp.float32(0.0),
        )


class ZenithReconstruction(StandardLearnedTask):
    """sigmoid·π zenith (reference ``:73-84``)."""

    task_nb_inputs = 1
    default_target_labels = ("zenith",)
    default_prediction_labels = ("zenith_pred",)

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return jax.nn.sigmoid(x[:, :1]) * jnp.pi, jnp.float32(0.0)


class ZenithReconstructionWithKappa(ZenithReconstruction):
    """Zenith + |κ| (reference ``:87-98``)."""

    task_nb_inputs = 2
    default_prediction_labels = ("zenith_pred", "zenith_kappa")

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        angle, _ = ZenithReconstruction._forward(self, x[:, :1])
        kappa = jnp.abs(x[:, 1]) + EPS
        return jnp.stack([angle[:, 0], kappa], axis=1), jnp.float32(0.0)


class EnergyReconstruction(StandardLearnedTask):
    """softplus(β=0.05) energy head (reference ``:101-112``).

    torch's softplus with beta: (1/β) log(1 + exp(βx))."""

    task_nb_inputs = 1
    default_target_labels = ("energy",)
    default_prediction_labels = ("energy_pred",)

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return (
            jax.nn.softplus(0.05 * x) / 0.05 + EPS,
            jnp.float32(0.0),
        )


class EnergyReconstructionWithPower(StandardLearnedTask):
    """10^(x+1) energy head (reference ``:115-126``)."""

    task_nb_inputs = 1
    default_target_labels = ("energy",)
    default_prediction_labels = ("energy_pred",)

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return jnp.power(10.0, x[:, :1] + 1.0), jnp.float32(0.0)


class EnergyTCReconstruction(StandardLearnedTask):
    """Track+cascade energies, both softplus(β=0.05) (reference ``:129-147``)."""

    task_nb_inputs = 2
    default_target_labels = ("energy_track", "energy_cascade")
    default_prediction_labels = ("energy_track_pred", "energy_cascade_pred")

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return (
            jax.nn.softplus(0.05 * x) / 0.05 + EPS,
            jnp.float32(0.0),
        )


class EnergyReconstructionWithUncertainty(EnergyReconstruction):
    """Energy + log-variance (reference ``:150-166``)."""

    task_nb_inputs = 2
    default_prediction_labels = ("energy_pred", "energy_sigma")

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        energy, _ = EnergyReconstruction._forward(self, x[:, :1])
        log_var = x[:, 1]
        return jnp.stack([energy[:, 0], log_var], axis=1), jnp.float32(0.0)


class VertexReconstruction(StandardLearnedTask):
    """x, y, z (×100) and t (reference ``:169-190``)."""

    task_nb_inputs = 4
    default_target_labels = ("vertex",)
    default_prediction_labels = (
        "position_x_pred",
        "position_y_pred",
        "position_z_pred",
        "interaction_time_pred",
    )

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        scale = jnp.asarray([1e2, 1e2, 1e2, 1.0], x.dtype)
        return x * scale, jnp.float32(0.0)


class PositionReconstruction(StandardLearnedTask):
    """x, y, z ×100 (reference ``:193-210``)."""

    task_nb_inputs = 3
    default_target_labels = ("position",)
    default_prediction_labels = (
        "position_x_pred",
        "position_y_pred",
        "position_z_pred",
    )

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return x * 1e2, jnp.float32(0.0)


class TimeReconstruction(StandardLearnedTask):
    """Identity time head (reference ``:213-224``)."""

    task_nb_inputs = 1
    default_target_labels = ("interaction_time",)
    default_prediction_labels = ("interaction_time_pred",)


class InelasticityReconstruction(StandardLearnedTask):
    """sigmoid inelasticity (reference ``:227-240``)."""

    task_nb_inputs = 1
    default_target_labels = ("inelasticity",)
    default_prediction_labels = ("inelasticity_pred",)

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return jax.nn.sigmoid(x), jnp.float32(0.0)
