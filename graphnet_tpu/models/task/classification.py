"""Classification task heads (mirror of reference
``src/graphnet/models/task/classification.py``)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from graphnet_tpu.models.task.task import IdentityTask, StandardLearnedTask

Array = jax.Array


class MulticlassClassificationTask(IdentityTask):
    """Logits head with one column per class (reference ``:9-15``)."""


class BinaryClassificationTask(StandardLearnedTask):
    """Sigmoid probability head (reference ``:18-28``)."""

    task_nb_inputs = 1
    default_target_labels = ("target",)
    default_prediction_labels = ("target_pred",)

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        return jax.nn.sigmoid(x), jnp.float32(0.0)


class BinaryClassificationTaskLogits(StandardLearnedTask):
    """Raw-logit head (reference ``:31-40``)."""

    task_nb_inputs = 1
    default_target_labels = ("target",)
    default_prediction_labels = ("target_pred",)
