"""Training schedule + early stopping utilities.

Mirrors of reference ``src/graphnet/training/callbacks.py``: the
``PiecewiseLinearLR`` scheduler (``:25-78``) becomes an optax schedule;
``GraphnetEarlyStopping`` (``:163-249``) becomes a host-side state object the
Trainer consults each validation epoch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import optax


def piecewise_linear_schedule(
    base_lr: float,
    milestones: Sequence[int],
    factors: Sequence[float],
) -> optax.Schedule:
    """Learning rate = ``base_lr * interp(step, milestones, factors)``.

    Exact analogue of the reference scheduler: constant extrapolation outside
    the milestone range, linear interpolation between milestones.  The
    canonical DynEdge schedule is factors [1e-2, 1, 1e-2] at milestones
    [0, len(train)/2, len(train)*epochs]
    (reference ``examples/04_training/01_train_dynedge.py:130-141``).
    """
    ms = jnp.asarray(milestones, jnp.float32)
    fs = jnp.asarray(factors, jnp.float32)

    def schedule(step):
        return base_lr * jnp.interp(
            jnp.asarray(step, jnp.float32), ms, fs
        )

    return schedule


class EarlyStopping:
    """Track validation loss; signal stop after ``patience`` epochs without
    improvement (reference ``GraphnetEarlyStopping``, ``callbacks.py:163``)."""

    def __init__(self, patience: int = 5, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best: float = np.inf
        self.best_epoch: int = -1
        self.counter: int = 0

    def update(self, value: float, epoch: int) -> bool:
        """Record a validation metric; returns True if this is a new best."""
        if value < self.best - self.min_delta:
            self.best = value
            self.best_epoch = epoch
            self.counter = 0
            return True
        self.counter += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.counter >= self.patience
