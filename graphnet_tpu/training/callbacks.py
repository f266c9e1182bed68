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


class JSONLinesLogger:
    """Minimal experiment logger for ``Trainer(metric_logger=...)``:
    appends one JSON object per ``log_metrics`` call to a ``.jsonl``
    file (step + metrics + wall time).

    In-repo stand-in for the W&B logger the reference examples wire up
    (``/root/reference/examples/04_training/01_train_dynedge.py:46-56``)
    — same duck type as ``wandb`` (the Trainer accepts either), no
    service dependency, trivially machine-readable afterwards::

        logger = JSONLinesLogger("runs/exp1/metrics.jsonl")
        Trainer(model, metric_logger=logger).fit(loader)
        history = logger.read()   # list of dicts

    Pass ``resume=True`` when the run itself resumes
    (``Trainer.fit(resume=True)`` after preemption) so pre-preemption
    records are kept; the default truncates for a fresh run.
    """

    def __init__(self, path: str, resume: bool = False):
        import os

        self.path = path
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        if not resume:
            open(path, "w").close()
        elif not os.path.exists(path):
            open(path, "a").close()

    def log_metrics(self, metrics, step: int) -> None:
        import json
        import time

        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self):
        import json

        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
