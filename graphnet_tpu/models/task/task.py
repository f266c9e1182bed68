"""Physics task heads — mirrors of the reference ``src/graphnet/models/task/task.py``.

A task is a flax module holding the learned affine map from backbone latents
to task space, a fixed output transform (``_forward``), optional
target/inference transforms, and a loss function.  Unlike the torch version,
``_forward`` returns ``(prediction, regularisation_loss)`` instead of
mutating instance state (JAX purity), and inference-vs-training transform
selection is an explicit ``inference`` argument rather than mutable state
(reference toggles ``self._inference``, ``task.py:125-137``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graphnet_tpu.training.loss_functions import LossFunction

Array = jax.Array
EPS = 1.1920929e-07  # float32 eps, matches torch `eps_like` on fp32


def validate_transforms(
    transform_prediction_and_target: Optional[Callable],
    transform_target: Optional[Callable],
    transform_inference: Optional[Callable],
    transform_support: Optional[Tuple[float, float]],
) -> None:
    """Check that target/inference transforms are mutual inverses on a test
    grid (reference ``task.py:144-222``)."""
    assert not (
        transform_prediction_and_target is not None
        and transform_target is not None
    ), (
        "Specify at most one of `transform_prediction_and_target` and "
        "`transform_target`"
    )
    if transform_target is not None and transform_inference is not None:
        if transform_support is not None:
            assert len(transform_support) == 2
            x_test = np.linspace(
                transform_support[0], transform_support[1], 10
            )
        else:
            grid = np.logspace(-6, 6, 13)
            x_test = np.concatenate([-grid[::-1], [0], grid])
        x_test = jnp.asarray(x_test, jnp.float32)
        try:
            t_test = transform_inference(transform_target(x_test))
            t_test = np.asarray(t_test)
            valid = np.isfinite(t_test)
            assert np.allclose(
                t_test[valid], np.asarray(x_test)[valid], rtol=1e-4, atol=1e-4
            ), (
                "The provided target/inference transforms are not mutually "
                "inverse."
            )
        except (IndexError, TypeError):
            pass  # indexing-dependent transforms: skip validation


class Task(nn.Module):
    """Base learned task.

    ``__call__(latents, inference) -> (prediction, regularisation_loss)``.
    Subclasses define ``_forward`` and the class attributes
    ``task_nb_inputs`` / ``default_target_labels`` /
    ``default_prediction_labels``.
    """

    loss_function: Optional[LossFunction] = None
    target_labels: Optional[Tuple[str, ...]] = None
    prediction_labels: Optional[Tuple[str, ...]] = None
    transform_prediction_and_target: Optional[Callable] = None
    transform_target: Optional[Callable] = None
    transform_inference: Optional[Callable] = None
    transform_support: Optional[Tuple[float, float]] = None
    loss_weight: Optional[str] = None
    # node-level tasks operate on per-node latents [B, L, d] (backbone with
    # skip_readout=True) and per-node truth from ``batch.node_labels``;
    # the loss masks padded nodes (used e.g. for pulse cleaning, the
    # reference's I3PulseCleanerModule use case)
    node_level: bool = False

    # subclass contract (plain class attributes — deliberately unannotated so
    # flax does not turn them into dataclass fields, which would freeze the
    # base-class defaults)
    task_nb_inputs = 1
    default_target_labels = ()
    default_prediction_labels = ()

    def __post_init__(self):
        super().__post_init__()
        validate_transforms(
            self.transform_prediction_and_target,
            self.transform_target,
            self.transform_inference,
            self.transform_support,
        )

    @property
    def nb_inputs(self) -> int:
        return self.task_nb_inputs

    @property
    def targets(self) -> Tuple[str, ...]:
        t = self.target_labels or self.default_target_labels
        return (t,) if isinstance(t, str) else tuple(t)

    @property
    def predictions(self) -> Tuple[str, ...]:
        p = self.prediction_labels or self.default_prediction_labels
        return (p,) if isinstance(p, str) else tuple(p)

    def _transform_prediction(self, pred: Array, inference: bool) -> Array:
        if self.transform_prediction_and_target is not None and not inference:
            return self.transform_prediction_and_target(pred)
        if self.transform_inference is not None and inference:
            return self.transform_inference(pred)
        return pred

    def _transform_target_fn(self, target: Array) -> Array:
        if self.transform_prediction_and_target is not None:
            return self.transform_prediction_and_target(target)
        if self.transform_target is not None:
            return self.transform_target(target)
        return target

    def _forward(self, x: Array) -> Tuple[Array, Array]:
        """Map affine outputs to task space; returns (pred, reg_loss)."""
        return x, jnp.float32(0.0)

    @nn.compact
    def __call__(
        self, latents: Array, inference: bool = False
    ) -> Tuple[Array, Array]:
        x = nn.Dense(self.nb_inputs, name="affine")(latents)
        pred, reg = self._forward(x)
        return self._transform_prediction(pred, inference), reg

    def compute_loss(
        self,
        pred: Array,
        reg: Array,
        labels: Dict[str, Array],
        weights: Optional[Array] = None,
        node_labels: Optional[Dict[str, Array]] = None,
        mask: Optional[Array] = None,
        event_weights: Optional[Array] = None,
    ) -> Array:
        """Stack target label columns, transform, evaluate loss
        (reference ``task.py:318-337``).

        Node-level tasks: ``pred`` is ``[B, L, d]``, targets come from
        ``node_labels`` (``[B, L]``), and padded nodes are excluded via
        zero weights with a valid-count-normalised mean.

        ``event_weights``: optional ``[B]`` multiplier (the Trainer's
        ragged-batch padding compensation; see ``EventBatch.event_weight``).
        """
        if self.node_level:
            assert node_labels is not None and mask is not None
            cols = [
                node_labels[label][..., None] for label in self.targets
            ]
            target = jnp.concatenate(cols, axis=-1)
            target = self._transform_target_fn(target)
            B, L, d = pred.shape
            pred_flat = pred.reshape(B * L, d)
            target_flat = target.reshape(B * L, -1)
            w = mask.astype(pred.dtype)
            if event_weights is not None:
                # scale cancels in the normalised mean; only the zeros on
                # padded events matter
                w = w * event_weights[:, None].astype(pred.dtype)
            w = w.reshape(B * L)
            assert self.loss_function is not None
            elements = self.loss_function(
                pred_flat, target_flat, return_elements=True
            )
            # elements may be [B*L] or [B*L, d]; reduce to one value per
            # node so the [B*L] weights pair per-node (a bare broadcast
            # of [N] against [N, 1] would build an [N, N] outer product
            # that silently *includes padded nodes* in the mean)
            elements = elements.reshape(B * L, -1).mean(axis=-1)
            return (
                jnp.sum(elements * w) / jnp.maximum(jnp.sum(w), 1.0)
                + reg
            )
        cols = []
        for label in self.targets:
            if label not in labels:
                raise KeyError(
                    f"Target label {label!r} not found in batch labels; "
                    f"available: {sorted(labels)}. Check the task's "
                    "target_labels against the dataset's truth columns."
                )
            v = labels[label]
            cols.append(v if v.ndim > 1 else v[:, None])
        target = jnp.concatenate(cols, axis=1)
        target = self._transform_target_fn(target)
        if self.loss_weight is not None:
            weights = labels[self.loss_weight]
        if event_weights is not None:
            weights = (
                event_weights
                if weights is None
                else weights * event_weights
            )
        assert self.loss_function is not None, "Task has no loss function"
        return self.loss_function(pred, target, weights=weights) + reg


class StandardLearnedTask(Task):
    """Affine head + fixed transform; elementwise supervised loss
    (reference ``task.py:287-337``)."""


class IdentityTask(StandardLearnedTask):
    """Head of configurable width returning affine outputs directly
    (reference ``task.py:340-385``)."""

    nb_outputs: int = 1

    @property
    def nb_inputs(self) -> int:
        return self.nb_outputs

    @property
    def predictions(self) -> Tuple[str, ...]:
        if self.prediction_labels:
            return tuple(self.prediction_labels)
        return tuple(f"target_{i}_pred" for i in range(len(self.targets)))
