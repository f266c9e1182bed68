"""Trainer — jitted training loop replacing the reference's Lightning glue
(``src/graphnet/models/easy_model.py:23-493``).

One jit-compiled train step per padded batch shape (shapes are bounded by
the dataloader's bucket set); optax optimiser with the canonical
piecewise-linear schedule; early stopping with best-checkpoint reload
(reference semantics, ``easy_model.py:177-184``); orbax checkpointing;
``predict``/``predict_as_dataframe`` parity (``easy_model.py:289-433``).

Multi-chip data parallelism: pass ``mesh`` (a 1D ``jax.sharding.Mesh`` over
a "data" axis) — batches are sharded over the batch dimension with
``NamedSharding``, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI (SURVEY.md §2.6 row "Data parallelism").
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core

from graphnet_tpu.batch import EventBatch, StackedBatches
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.training.callbacks import (
    EarlyStopping,
    piecewise_linear_schedule,
)
from graphnet_tpu.utils.logging import Logger


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


class Trainer(Logger):
    """Fit / validate / predict a StandardModel."""

    def __init__(
        self,
        model: StandardModel,
        optimizer: Optional[optax.GradientTransformation] = None,
        learning_rate: float = 1e-3,
        schedule: Optional[optax.Schedule] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        data_axis: str = "data",
        model_axis: str = "model",
        param_sharding: str = "replicated",
        checkpoint_dir: Optional[str] = None,
        seed: int = 42,
        averaging: Optional[str] = None,
        ema_decay: float = 0.999,
        clip_grad_norm: Optional[float] = None,
        metric_logger: Optional[Any] = None,
        progress_bar: bool = False,
        steps_per_dispatch: int = 1,
    ) -> None:
        """``averaging``: None, "swa" (equal-weight running average) or
        "ema" — analogue of the reference's StandardAveragedModel
        (``standard_averaged_model.py:21-154``); averaged weights are
        updated per optimiser step and swapped in at fit end.

        ``metric_logger``: optional experiment logger — any object with
        ``log_metrics(metrics: dict, step: int)``, or a wandb-style object
        with ``.log(dict, step=...)`` (the reference wires W&B in its
        examples, ``examples/04_training/01_train_dynedge.py:46-56``).

        ``param_sharding``: "replicated" (plain DP), "fsdp" (shard
        parameters *and* optimizer state over the data axis — ZeRO-3 via
        GSPMD, see :func:`graphnet_tpu.parallel.mesh.fsdp_sharding`),
        "tp" (Megatron column/row tensor parallelism over the
        ``model_axis`` of a 2D mesh, see
        :mod:`graphnet_tpu.parallel.tensor_parallel`), or "fsdp+tp"
        (TP placement for matched attention/FFN layers, FSDP over the
        data axis for everything else).  All modes keep DP numerics;
        they differ only in per-chip memory and collective pattern.

        ``steps_per_dispatch``: run k optimiser steps per device dispatch
        via ``lax.scan`` over k same-shape batches (stacked *on device*,
        inside the jitted call — host stacking would be a device→host
        readback, which degrades the tunneled runtime permanently).  On
        runtimes with high per-dispatch latency (the axon tunnel costs
        ~11.5 ms per call vs 6.6 ms chip time for the headline DynEdge
        step) this amortises the dispatch overhead ~k-fold.  Numerics are
        identical to k single steps in the same order; batches of a
        less-common padded shape are buffered per shape and flushed
        one-by-one at epoch end."""
        super().__init__()
        assert averaging in (None, "swa", "ema")
        assert steps_per_dispatch >= 1
        # steps_per_dispatch>1 composes with SWA/EMA exactly: the scan
        # threads the averaged weights through its carry (one update per
        # optimiser step, same numerics as single dispatch)
        self.steps_per_dispatch = steps_per_dispatch
        assert param_sharding in ("replicated", "fsdp", "tp", "fsdp+tp")
        self.param_sharding = param_sharding
        self.model_axis = model_axis
        if param_sharding != "replicated":
            # fail fast: without a mesh, _replicate is a no-op and the
            # requested sharding would silently not happen
            assert mesh is not None, (
                f"param_sharding={param_sharding!r} requires mesh=... "
                "(use graphnet_tpu.parallel.mesh.make_mesh)"
            )
        if "tp" in param_sharding and mesh is not None:
            assert model_axis in mesh.axis_names, (
                f"param_sharding={param_sharding!r} needs a mesh with a "
                f"{model_axis!r} axis (use make_mesh(n_data, n_model))"
            )
        self.clip_grad_norm = clip_grad_norm
        self.averaging = averaging
        self.ema_decay = ema_decay
        self._avg_params = None
        self._avg_count = 0
        self.model = model
        self._lr = learning_rate
        self._schedule = schedule
        self._custom_optimizer = optimizer is not None
        if optimizer is None:
            # reference default: Adam(lr=1e-3, eps=1e-3)
            # (`examples/04_training/01_train_dynedge.py:128-141`).
            # A constant lr is wrapped as a schedule so the optimiser
            # state structure is identical with and without schedules —
            # keeps resume checkpoints compatible across the two modes.
            optimizer = optax.adam(
                learning_rate=schedule if schedule is not None else (
                    optax.constant_schedule(learning_rate)
                ),
                eps=1e-3,
            )
        self.mesh = mesh
        self.optimizer = self._finalize_optimizer(optimizer)
        self.data_axis = data_axis
        self.checkpoint_dir = checkpoint_dir
        self.seed = seed
        self.state: Optional[TrainState] = None
        self.metric_logger = metric_logger
        # tqdm epoch bar (reference's Lightning ProgressBar,
        # `training/callbacks.py:81`); loss postfix updates only at the
        # log interval so the hot loop stays sync-free
        self.progress_bar = progress_bar
        self._dropout_rng = jax.random.PRNGKey(seed + 1)
        self._train_step_fn = None
        self._train_scan_fn = None
        self._eval_step_fn = None
        self._predict_fn = None

    def _current_lr(self) -> float:
        """Learning rate at the current optimiser step (NaN when a
        custom optimizer was supplied without a schedule — the Trainer
        cannot know its internal rate and must not report a wrong one)."""
        step = self.state.step if self.state is not None else 0
        if self._schedule is not None:
            return float(self._schedule(step))
        if self._custom_optimizer:
            return float("nan")
        return float(self._lr)

    def _log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        if self.metric_logger is None:
            return
        if hasattr(self.metric_logger, "log_metrics"):
            self.metric_logger.log_metrics(metrics, step=step)
        elif hasattr(self.metric_logger, "log"):  # wandb-style
            self.metric_logger.log(metrics, step=step)

    def _maybe_clip(self, optimizer):
        if self.clip_grad_norm is None:
            return optimizer
        return optax.chain(
            optax.clip_by_global_norm(self.clip_grad_norm), optimizer
        )

    def _finalize_optimizer(self, optimizer):
        """Clip + (when safe) flatten.

        ``optax.flatten`` runs the update on ONE contiguous vector
        instead of ~50 small per-leaf kernels — measured 0.49 ms/step of
        pure launch overhead for the canonical DynEdge tree on a v5e
        (the arithmetic itself is ~30 us of HBM traffic).  Applied on
        the single-chip path only: sharded layouts (fsdp/tp) shard per
        leaf, and under a replicated MESH the ravel perturbs update
        rounding (~5e-5 over 4 steps) which would break the exact
        replicated==fsdp parity the multi-device tests pin down.
        """
        optimizer = self._maybe_clip(optimizer)
        if self.param_sharding == "replicated" and self.mesh is None:
            optimizer = optax.flatten(optimizer)
        return optimizer

    # ------------------------------------------------------------------
    def _pad_to_multiple(self, batch: EventBatch) -> EventBatch:
        """Pad the batch dimension up to a multiple of the data-axis size.

        ``LenMatchBatchSampler`` emits ragged leftover batches
        (``dataloader.py:131-136``); under a mesh, a non-divisible B cannot
        be sharded.  Pad events are copies of the last event carrying zero
        ``event_weight``, while real events carry ``B_pad / B_real`` — the
        plain-mean loss reduction then equals the unpadded batch exactly.
        """
        if self.mesh is None:
            return batch
        n = self.mesh.shape[self.data_axis]
        P = jax.process_count()
        if P > 1:
            # multi-host: this is the process-LOCAL batch (global B =
            # local B x P), so divisibility is per-process
            assert n % P == 0, (self.mesh.shape, P)
            n //= P
        B = batch.batch_size
        rem = B % n
        if rem == 0:
            # remember the nominal (divisible) batch size so ragged
            # leftovers can pad straight to an already-compiled shape —
            # each distinct padded B is otherwise a fresh XLA compile
            self._nominal_batch_size = max(
                B, getattr(self, "_nominal_batch_size", 0)
            )
            return batch
        nominal = getattr(self, "_nominal_batch_size", 0)
        if nominal > B:
            Bp = nominal
        else:
            Bp = B + (n - rem)
        pad = Bp - B
        idx = np.concatenate(
            [np.arange(B), np.full(pad, B - 1, dtype=np.int64)]
        )

        def take(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
                if isinstance(x, jax.Array):
                    # device-resident leaf (e.g. CachingLoader HBM
                    # replay): gather on device — np.asarray here would
                    # be a D2H readback, which permanently degrades the
                    # tunneled runtime (CLAUDE.md)
                    return x[jnp.asarray(idx)]
                # host leaf: pad in numpy so the downstream multi-host
                # make_array_from_process_local_data sees host data
                return np.asarray(x)[idx]
            return x

        padded = jax.tree_util.tree_map(take, batch)
        ew = batch.event_weight
        xp = jnp if isinstance(ew, jax.Array) else np
        base = (
            xp.asarray(ew, xp.float32)
            if ew is not None
            else xp.ones((B,), xp.float32)
        )
        ev = xp.concatenate(
            [base * (Bp / B), xp.zeros((pad,), xp.float32)]
        )
        return padded.replace(event_weight=ev)

    def _shard_batch(self, batch: EventBatch) -> EventBatch:
        if self.mesh is None:
            return batch
        batch = self._pad_to_multiple(batch)
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(self.data_axis)
        )
        if jax.process_count() > 1:
            # multi-host: every process feeds its LOCAL batch; the
            # global array (B_local x P on the batch axis) is assembled
            # without any cross-host data movement.  Feed shape-aligned
            # per-process streams (MaterializedLoader process shards, or
            # equal slices of a shared selection) so all hosts agree on
            # the global shape each step.
            def put(x):
                if hasattr(x, "ndim") and x.ndim >= 1:
                    return jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)
                    )
                return x

            return jax.tree_util.tree_map(put, batch)

        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                return jax.device_put(x, sharding)
            return x

        return jax.tree_util.tree_map(put, batch)

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        if self.param_sharding == "fsdp":
            from graphnet_tpu.parallel.mesh import shard_fsdp

            return shard_fsdp(tree, self.mesh, axis=self.data_axis)
        if self.param_sharding in ("tp", "fsdp+tp"):
            from graphnet_tpu.parallel.tensor_parallel import (
                tensor_parallel_sharding,
            )

            specs = tensor_parallel_sharding(
                self.mesh, tree, axis=self.model_axis
            )
            if self.param_sharding == "fsdp+tp":
                # TP wins for matched attention/FFN layers; everything
                # else (embeddings, EdgeConv MLPs, task heads) shards
                # FSDP-style over the data axis so no large leaf is
                # fully replicated.
                from graphnet_tpu.parallel.mesh import fsdp_sharding

                dp_specs = fsdp_sharding(
                    self.mesh, tree, axis=self.data_axis
                )
                is_ns = lambda x: isinstance(  # noqa: E731
                    x, jax.sharding.NamedSharding
                )
                specs = jax.tree_util.tree_map(
                    lambda t, d: (
                        t
                        if any(e == self.model_axis for e in tuple(t.spec))
                        else d
                    ),
                    specs,
                    dp_specs,
                    is_leaf=is_ns,
                )
            return jax.device_put(tree, specs)
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )
        return jax.device_put(tree, sharding)

    # ------------------------------------------------------------------
    def init(self, example_batch: EventBatch) -> TrainState:
        params = self.model.init(
            {
                "params": jax.random.PRNGKey(self.seed),
                "dropout": self._dropout_rng,
            },
            example_batch,
        )
        opt_state = self.optimizer.init(params)
        params = self._replicate(params)
        opt_state = self._replicate(opt_state)
        self.state = TrainState(params=params, opt_state=opt_state)
        return self.state

    def _make_steps(self) -> None:
        from graphnet_tpu.models.standard_model import (
            deterministic_clone,
        )

        model, optimizer = self.model, self.optimizer
        eval_model = deterministic_clone(model)

        def loss_fn(params, batch: EventBatch, rng=None):
            # training passes a "dropout" rng so stochastic
            # regularisation (Dropout/DropPath with deterministic=False)
            # works; unused rngs are harmless for deterministic models
            rngs = {"dropout": rng} if rng is not None else None
            outputs = model.apply(params, batch, rngs=rngs)
            return model.loss_from_batch(outputs, batch)

        # donate params/opt_state: both are replaced every step, so XLA
        # can update them in place (halves their HBM footprint; matters
        # for large models). CPU ignores donation with a warning — gate.
        donate = (0, 1) if jax.default_backend() == "tpu" else ()

        @functools.partial(jax.jit, donate_argnums=donate)
        def train_step(params, opt_state, batch: EventBatch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, rng
            )
            updates, opt_state = optimizer.update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_step(params, batch: EventBatch):
            outputs = eval_model.apply(params, batch)
            return eval_model.loss_from_batch(outputs, batch)

        @jax.jit
        def predict_step(params, batch: EventBatch):
            outputs = eval_model.apply(params, batch, inference=True)
            if not isinstance(outputs, (list, tuple)):
                # models with a single array output (e.g. NormalizingFlow
                # returning per-event NLLH)
                return [
                    outputs if outputs.ndim > 1 else outputs[:, None]
                ]
            return [pred for pred, _reg in outputs]

        @functools.partial(jax.jit, donate_argnums=donate)
        def train_scan(params, opt_state, batches, rngs):
            # stack the k batches on device, inside this dispatch — the
            # loader's batches already live on device and pulling them
            # back to host would be a D2H readback
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *batches
            )
            rng_arr = jnp.stack(rngs)

            def one(carry, xs):
                p, o = carry
                b, r = xs
                loss, grads = jax.value_and_grad(loss_fn)(p, b, r)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                one, (params, opt_state), (stacked, rng_arr)
            )
            return params, opt_state, losses

        averaging, ema_decay = self.averaging, self.ema_decay
        donate_avg = (0, 1, 2) if jax.default_backend() == "tpu" else ()

        @functools.partial(jax.jit, donate_argnums=donate_avg)
        def train_scan_avg(params, opt_state, avg, count0, batches, rngs):
            """train_scan + exact per-step SWA/EMA updates inside the
            scan (identical numerics to k sequential
            :meth:`_single_train_step` + :meth:`_update_averages`
            calls)."""
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *batches
            )
            rng_arr = jnp.stack(rngs)

            def one(carry, xs):
                p, o, a, c = carry
                b, r = xs
                loss, grads = jax.value_and_grad(loss_fn)(p, b, r)
                updates, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                first = c == 0
                c = c + 1.0
                if averaging == "swa":
                    a = jax.tree_util.tree_map(
                        lambda ai, pi: jnp.where(
                            first, pi, ai + (pi - ai) / c
                        ),
                        a,
                        p,
                    )
                else:  # ema
                    a = jax.tree_util.tree_map(
                        lambda ai, pi: jnp.where(
                            first,
                            pi,
                            ema_decay * ai + (1.0 - ema_decay) * pi,
                        ),
                        a,
                        p,
                    )
                return (p, o, a, c), loss

            (params, opt_state, avg, _), losses = jax.lax.scan(
                one, (params, opt_state, avg, count0), (stacked, rng_arr)
            )
            return params, opt_state, avg, losses

        @functools.partial(jax.jit, donate_argnums=donate)
        def train_scan_stacked(params, opt_state, stacked, rng_arr):
            """train_scan over batches that arrive PRE-STACKED from
            ``DataLoader(stack_k=k)`` (one host-side np.stack + one
            device_put per dispatch instead of k — see
            batch.StackedBatches).  Numerics identical to train_scan."""

            def one(carry, xs):
                p, o = carry
                b, r = xs
                loss, grads = jax.value_and_grad(loss_fn)(p, b, r)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                one, (params, opt_state), (stacked, rng_arr)
            )
            return params, opt_state, losses

        @functools.partial(jax.jit, donate_argnums=donate_avg)
        def train_scan_avg_stacked(
            params, opt_state, avg, count0, stacked, rng_arr
        ):
            def one(carry, xs):
                p, o, a, c = carry
                b, r = xs
                loss, grads = jax.value_and_grad(loss_fn)(p, b, r)
                updates, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                first = c == 0
                c = c + 1.0
                if averaging == "swa":
                    a = jax.tree_util.tree_map(
                        lambda ai, pi: jnp.where(
                            first, pi, ai + (pi - ai) / c
                        ),
                        a,
                        p,
                    )
                else:  # ema
                    a = jax.tree_util.tree_map(
                        lambda ai, pi: jnp.where(
                            first,
                            pi,
                            ema_decay * ai + (1.0 - ema_decay) * pi,
                        ),
                        a,
                        p,
                    )
                return (p, o, a, c), loss

            (params, opt_state, avg, _), losses = jax.lax.scan(
                one, (params, opt_state, avg, count0), (stacked, rng_arr)
            )
            return params, opt_state, avg, losses

        def with_hints(fn):
            """Expose the trainer mesh to module code while TRACING (the
            graph-sharding halo hints in EdgeConv; no-op for meshes
            without a ``graph`` axis — see parallel/graph_sharding.py)."""
            from graphnet_tpu.parallel.graph_sharding import (
                graph_sharding_hints,
            )

            mesh = self.mesh

            def wrapped(*args):
                with graph_sharding_hints(mesh):
                    return fn(*args)

            return wrapped

        self._train_step_fn = with_hints(train_step)
        self._train_scan_fn = with_hints(train_scan)
        self._train_scan_avg_fn = with_hints(train_scan_avg)
        self._train_scan_stacked_fn = with_hints(train_scan_stacked)
        self._train_scan_avg_stacked_fn = with_hints(
            train_scan_avg_stacked
        )
        self._eval_step_fn = with_hints(eval_step)
        self._predict_fn = with_hints(predict_step)

    # ------------------------------------------------------------------
    def _single_train_step(self, batch: EventBatch):
        """One optimiser step; returns the scalar loss (on device)."""
        step_rng = jax.random.fold_in(self._dropout_rng, self.state.step)
        params, opt_state, loss = self._train_step_fn(
            self.state.params, self.state.opt_state, batch, step_rng
        )
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            step=self.state.step + 1,
        )
        self._update_averages(params)
        return loss

    def _scan_train_steps(self, group):
        """k optimiser steps in ONE device dispatch (``lax.scan``);
        returns the [k] per-step losses (on device).  Identical numerics
        to k sequential :meth:`_single_train_step` calls — the dropout
        rngs fold in the same per-step indices."""
        k = len(group)
        rngs = tuple(
            jax.random.fold_in(self._dropout_rng, self.state.step + j)
            for j in range(k)
        )
        if self.averaging is not None:
            # exact per-step weight averaging rides the scan carry
            seeded = self._avg_params is not None
            # zeros (not params) when unseeded: the scan's `first` branch
            # overwrites them, and donating params as BOTH arg 0 and the
            # avg arg would alias two donated buffers
            avg0 = (
                self._avg_params
                if seeded
                else jax.tree_util.tree_map(
                    jnp.zeros_like, self.state.params
                )
            )
            count0 = jnp.float32(self._avg_count if seeded else 0)
            params, opt_state, avg, losses_k = self._train_scan_avg_fn(
                self.state.params,
                self.state.opt_state,
                avg0,
                count0,
                tuple(group),
                rngs,
            )
            self._avg_params = avg
            self._avg_count = (self._avg_count if seeded else 0) + k
        else:
            params, opt_state, losses_k = self._train_scan_fn(
                self.state.params,
                self.state.opt_state,
                tuple(group),
                rngs,
            )
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            step=self.state.step + k,
        )
        return losses_k

    def _scan_train_steps_stacked(self, sb):
        """k optimiser steps in ONE device dispatch over a pre-stacked
        :class:`~graphnet_tpu.batch.StackedBatches` (from
        ``DataLoader(stack_k=k)``).  Numerics identical to
        :meth:`_scan_train_steps` on the k unstacked batches."""
        k = sb.k
        rngs = jnp.stack(
            [
                jax.random.fold_in(self._dropout_rng, self.state.step + j)
                for j in range(k)
            ]
        )
        if self.averaging is not None:
            seeded = self._avg_params is not None
            avg0 = (
                self._avg_params
                if seeded
                else jax.tree_util.tree_map(
                    jnp.zeros_like, self.state.params
                )
            )
            count0 = jnp.float32(self._avg_count if seeded else 0)
            params, opt_state, avg, losses_k = (
                self._train_scan_avg_stacked_fn(
                    self.state.params,
                    self.state.opt_state,
                    avg0,
                    count0,
                    sb.batches,
                    rngs,
                )
            )
            self._avg_params = avg
            self._avg_count = (self._avg_count if seeded else 0) + k
        else:
            params, opt_state, losses_k = self._train_scan_stacked_fn(
                self.state.params,
                self.state.opt_state,
                sb.batches,
                rngs,
            )
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            step=self.state.step + k,
        )
        return losses_k

    # ------------------------------------------------------------------
    def fit(
        self,
        train_loader,
        val_loader=None,
        *,
        max_epochs: int = 10,
        early_stopping_patience: int = 5,
        use_default_schedule: bool = True,
        log_every_n_steps: int = 25,
        ckpt_best: bool = True,
        resume: bool = False,
        profile_dir: Optional[str] = None,
        prefetch: int = 0,
    ) -> Dict[str, List[float]]:
        """Train; returns history dict. Mirrors `EasySyntax.fit` defaults
        (`easy_model.py:114-184`): early stopping on val_loss with best-
        weight restore at the end.

        ``resume=True`` restores ``<checkpoint_dir>/last`` (params,
        optimiser state, epoch) if present — preemption-safe training.
        ``profile_dir`` captures a jax profiler trace of the first epoch's
        steps for xprof analysis.

        ``prefetch > 0`` streams every epoch through ONE warm
        :class:`~graphnet_tpu.data.prefetch.EpochPipeline` (background
        host pipeline + eager ``device_put``, ``prefetch`` items deep):
        the host builds epoch e+1's first batches while the device
        finishes epoch e, and the pipeline never drains at epoch
        boundaries.  Combined with ``DataLoader(stack_k=k)`` and
        ``steps_per_dispatch=k`` this is the measured-fastest delivery
        path on tunneled runtimes (``docs/architecture.md`` §5) —
        depth 4-8 recommended.  Single-controller placement only:
        ignored (with a warning) when a Trainer ``mesh`` is set —
        sharded batches take :meth:`_shard_batch`'s placement."""
        if use_default_schedule and self._schedule is None:
            # canonical DynEdge schedule
            steps_per_epoch = max(len(train_loader), 1)
            self._schedule = piecewise_linear_schedule(
                self._lr,
                [0, steps_per_epoch // 2, steps_per_epoch * max_epochs],
                [1e-2, 1.0, 1e-2],
            )
            self.optimizer = self._finalize_optimizer(
                optax.adam(learning_rate=self._schedule, eps=1e-3)
            )

        self._make_steps()
        history: Dict[str, List[float]] = {
            "train_loss": [],
            "val_loss": [],
        }
        stopper = EarlyStopping(patience=early_stopping_patience)
        best_params = None

        start_epoch = 0
        last_ckpt = (
            os.path.join(self.checkpoint_dir, "last")
            if self.checkpoint_dir
            else None
        )
        do_resume = bool(resume and last_ckpt and os.path.exists(last_ckpt))
        if jax.process_count() > 1 and resume and last_ckpt:
            # checkpoint files may exist on the primary host only
            # (orbax's primary-host write): take the resume decision
            # from process 0 so every process enters the collective
            # restore/save machinery in lockstep — a per-host
            # os.path.exists diverges across hosts and deadlocks with a
            # "sync_global_devices name mismatch".  Restoring still
            # requires checkpoint_dir on a shared filesystem (every
            # process reads its addressable shards).
            from jax.experimental import multihost_utils

            do_resume = bool(
                multihost_utils.broadcast_one_to_all(
                    np.int32(do_resume)
                )
            )
        if do_resume:
            example = next(iter(train_loader))
            start_epoch = self.load_train_state(last_ckpt, example) + 1
            self.info(f"resumed from {last_ckpt} at epoch {start_epoch}")

        profiling = False
        if profile_dir is not None:
            jax.profiler.start_trace(profile_dir)
            profiling = True

        pipeline = None
        if prefetch and self.mesh is not None:
            self.warning(
                "fit(prefetch=...) is single-controller only; ignored "
                "because a mesh is set (batches take _shard_batch's "
                "placement)"
            )
        elif prefetch:
            from graphnet_tpu.data.prefetch import EpochPipeline

            pipeline = EpochPipeline(
                train_loader,
                max_epochs,
                prefetch=prefetch,
                start_epoch=start_epoch,
            )

        try:
            for epoch in range(start_epoch, max_epochs):
                # pin epoch-dependent shuffle schedules (CachingLoader/
                # MaterializedLoader): a resumed run then replays exactly
                # the batch order the uninterrupted run would have used
                # (the pipeline producer forwards set_epoch itself)
                if pipeline is None and hasattr(train_loader, "set_epoch"):
                    train_loader.set_epoch(epoch)
                t0 = time.time()
                losses = []
                n_events = 0
                iterator = (
                    pipeline.epoch() if pipeline is not None else train_loader
                )
                if self.progress_bar:
                    from tqdm.auto import tqdm

                    iterator = tqdm(
                        iterator,
                        total=len(train_loader),
                        desc=f"epoch {epoch}",
                        unit="batch",
                        leave=False,
                    )
                buf: Dict[Any, List[EventBatch]] = {}
                for i, batch in enumerate(iterator):
                    n_events += batch.batch_size
                    if isinstance(batch, StackedBatches):
                        # pre-stacked k-step dispatch (DataLoader(stack_k=k))
                        if self.mesh is not None:
                            raise NotImplementedError(
                                "DataLoader(stack_k>1) with a Trainer mesh: "
                                "shard the batches instead (stack_k targets "
                                "single-device transfer-dispatch cost)"
                            )
                        if self.state is None:
                            self.init(
                                jax.tree_util.tree_map(
                                    lambda a: a[0], batch.batches
                                )
                            )
                            self._log_param_count()
                        loss = self._scan_train_steps_stacked(batch)
                        losses.append(jnp.atleast_1d(loss))
                        continue
                    batch = self._shard_batch(batch)
                    if self.state is None:
                        self.init(batch)
                        self._log_param_count()
                    assert self.state is not None
                    if self.steps_per_dispatch > 1:
                        # buffer per padded shape; dispatch k steps at once
                        leaves, treedef = jax.tree_util.tree_flatten(batch)
                        key = (
                            treedef,
                            tuple(getattr(x, "shape", ()) for x in leaves),
                        )
                        group = buf.setdefault(key, [])
                        group.append(batch)
                        if len(group) < self.steps_per_dispatch:
                            continue
                        del buf[key]
                        loss = self._scan_train_steps(group)  # [k] on device
                    else:
                        loss = self._single_train_step(batch)
                    # device scalar/vector — no host sync in the hot loop; the
                    # only sync is the (rare) log-interval print below
                    losses.append(jnp.atleast_1d(loss))
                    if (i + 1) % log_every_n_steps == 0:
                        last = loss if getattr(loss, "ndim", 0) == 0 else loss[-1]
                        lr = self._current_lr()
                        lr_txt = f" lr={lr:.3e}" if np.isfinite(lr) else ""
                        if self.progress_bar:
                            iterator.set_postfix(
                                train_loss=f"{float(last):.4f}", refresh=False
                            )
                        else:
                            self.info(
                                f"epoch {epoch} step {i+1}: "
                                f"train_loss={float(last):.4f}{lr_txt}"
                            )
                        metrics = {"train_loss": float(last)}
                        if np.isfinite(lr):
                            metrics["lr"] = lr
                        self._log_metrics(metrics, step=self.state.step)
                # flush per-shape leftovers (fewer than k batches buffered)
                for group in buf.values():
                    for b in group:
                        losses.append(
                            jnp.atleast_1d(self._single_train_step(b))
                        )
                # single host sync per epoch
                train_loss = float(jnp.mean(jnp.concatenate(losses)))
                epoch_time = time.time() - t0
                events_per_s = n_events / max(epoch_time, 1e-9)
                history["train_loss"].append(train_loss)
                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    self.info(f"profiler trace written to {profile_dir}")
                if last_ckpt is not None:
                    self.save_train_state(last_ckpt, epoch)

                lr = self._current_lr()
                lr_txt = f", lr={lr:.3e}" if np.isfinite(lr) else ""
                msg = (
                    f"epoch {epoch}: train_loss={train_loss:.4f} "
                    f"({epoch_time:.1f}s, {events_per_s:.0f} events/s"
                    f"{lr_txt})"
                )
                epoch_metrics = {
                    "train_loss": train_loss,
                    "events_per_s": events_per_s,
                }
                if np.isfinite(lr):
                    epoch_metrics["lr"] = lr
                pad_eff = getattr(
                    train_loader, "padding_efficiency", None
                )
                if pad_eff is not None and np.isfinite(pad_eff):
                    msg += f" pad_eff={pad_eff:.2f}"
                    epoch_metrics["padding_efficiency"] = pad_eff
                if val_loader is not None:
                    # accumulate on device; single host sync at the end
                    # (per-batch float() would serialise dispatch)
                    val_losses = []
                    counts = []
                    for batch in val_loader:
                        counts.append(batch.batch_size)  # real (pre-pad) count
                        batch = self._shard_batch(batch)
                        val_losses.append(
                            self._eval_step_fn(self.state.params, batch)
                        )
                    w = jnp.asarray(counts, jnp.float32)
                    val_loss = float(
                        jnp.sum(jnp.stack(val_losses) * w) / jnp.sum(w)
                    )
                    epoch_metrics["val_loss"] = val_loss
                    history["val_loss"].append(val_loss)
                    msg += f" val_loss={val_loss:.4f}"
                    improved = stopper.update(val_loss, epoch)
                    if improved:
                        best_params = self.state.params
                        if ckpt_best and self.checkpoint_dir:
                            self.save_checkpoint(
                                os.path.join(
                                    self.checkpoint_dir, "best"
                                )
                            )
                    if stopper.should_stop:
                        self.info(
                            f"early stopping at epoch {epoch} "
                            f"(best epoch {stopper.best_epoch})"
                        )
                        self.info(msg)
                        self._log_metrics(epoch_metrics, step=self.state.step)
                        break
                self.info(msg)
                self._log_metrics(epoch_metrics, step=self.state.step)

        finally:
            # stop the warm producer on EVERY exit path (early
            # stop, exception): it otherwise blocks forever on a
            # full queue, pinning the loader
            if pipeline is not None:
                pipeline.close()
        if profiling:
            jax.profiler.stop_trace()

        # swap in averaged weights (reference StandardAveragedModel
        # `standard_averaged_model.py:117-131`)
        if self.averaging is not None and self._avg_params is not None:
            self.state = TrainState(
                params=self._avg_params,
                opt_state=self.state.opt_state,
                step=self.state.step,
            )
            best_params = None  # averaged weights supersede best-ckpt swap

        # restore best weights (reference `easy_model.py:177-184`)
        if best_params is not None:
            self.state = TrainState(
                params=best_params,
                opt_state=self.state.opt_state,
                step=self.state.step,
            )
        return history

    def _update_averages(self, params) -> None:
        if self.averaging is None:
            return
        if self._avg_params is None:
            self._avg_params = params
            self._avg_count = 1
            return
        if self.averaging == "swa":
            n = self._avg_count
            self._avg_params = jax.tree_util.tree_map(
                lambda a, p: a + (p - a) / (n + 1),
                self._avg_params,
                params,
            )
            self._avg_count += 1
        else:  # ema
            d = self.ema_decay
            self._avg_params = jax.tree_util.tree_map(
                lambda a, p: d * a + (1.0 - d) * p,
                self._avg_params,
                params,
            )

    def _log_param_count(self) -> None:
        if self.state is None:
            return
        n = sum(
            np.prod(l.shape)
            for l in jax.tree_util.tree_leaves(self.state.params)
        )
        self.info(f"model has {int(n):,} parameters")

    # ------------------------------------------------------------------
    @staticmethod
    def _local_rows(o) -> np.ndarray:
        """This process's rows of a batch-sharded global output (its
        local batch occupies a contiguous global-row block, split over
        its addressable devices)."""
        shards = sorted(
            o.addressable_shards,
            key=lambda s: s.index[0].start or 0,
        )
        return np.concatenate(
            [np.asarray(s.data) for s in shards], axis=0
        )

    def predict(self, loader) -> List[np.ndarray]:
        """Per-task predictions, concatenated over batches
        (reference ``easy_model.py:289-318``).  Multi-host: each process
        feeds its local batches and receives predictions for exactly
        those events."""
        if self._predict_fn is None:
            self._make_steps()
        multihost = jax.process_count() > 1
        per_task: Optional[List[List[np.ndarray]]] = None
        for batch in loader:
            real_b = batch.batch_size
            sb = self._shard_batch(batch)
            if self.state is None:
                self.init(sb)
            outs = self._predict_fn(self.state.params, sb)
            if per_task is None:
                per_task = [[] for _ in outs]
            for i, o in enumerate(outs):
                # local rows under multi-host (the global array is not
                # fully addressable); drop mesh-divisibility pad events
                arr = (
                    self._local_rows(o) if multihost else np.asarray(o)
                )
                per_task[i].append(arr[:real_b])
        assert per_task is not None, "empty loader"
        return [np.concatenate(chunks, axis=0) for chunks in per_task]

    def predict_as_dataframe(
        self,
        loader,
        additional_attributes: Optional[List[str]] = None,
    ):
        """Predictions + requested truth attributes as a DataFrame
        (reference ``easy_model.py:321-433``).

        Node-level tasks (predictions ``[B, L, d]``) produce one row per
        valid pulse, with event attributes repeated per pulse (reference
        pulse-level broadcast, ``easy_model.py:372-395``).
        """
        import pandas as pd

        additional_attributes = additional_attributes or []
        if self._predict_fn is None:
            self._make_steps()
        columns = self.model.prediction_labels

        rows: List[np.ndarray] = []
        attrs: Dict[str, List[np.ndarray]] = {
            a: [] for a in additional_attributes
        }
        node_level = any(t.node_level for t in self.model.tasks)
        for batch in loader:
            sb = self._shard_batch(batch)
            if self.state is None:
                self.init(sb)
            if additional_attributes:
                # restore the label dicts from packed transport (one
                # jitted dispatch; predict is off the hot training loop)
                batch = batch.unpacked()
            outs = [
                np.asarray(o)[: batch.batch_size]  # drop pad events
                for o in self._predict_fn(self.state.params, sb)
            ]
            if node_level:
                mask = np.asarray(batch.mask)
                flat = [
                    o[mask] if o.ndim == 3 else np.repeat(
                        o, np.asarray(batch.n_pulses), axis=0
                    )
                    for o in outs
                ]
                rows.append(np.concatenate(flat, axis=1))
                reps = np.asarray(batch.n_pulses)
                for a in additional_attributes:
                    attrs[a].append(
                        np.repeat(
                            np.asarray(batch.labels[a]), reps, axis=0
                        )
                    )
            else:
                rows.append(np.concatenate(outs, axis=1))
                for a in additional_attributes:
                    attrs[a].append(np.asarray(batch.labels[a]))
        data = np.concatenate(rows, axis=0)
        assert data.shape[1] == len(columns), (
            f"prediction width {data.shape[1]} != labels {columns}"
        )
        df = pd.DataFrame(data, columns=columns)
        for a in additional_attributes:
            df[a] = np.concatenate(attrs[a], axis=0)
        return df

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Params-only snapshot (for serving / best-weights)."""
        import orbax.checkpoint as ocp

        assert self.state is not None
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path, jax.device_get(self.state.params), force=True
        )
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str, example_batch: EventBatch) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        target = self.model.init(
            {
                "params": jax.random.PRNGKey(self.seed),
                "dropout": self._dropout_rng,
            },
            example_batch,
        )
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(path, target=jax.device_get(target))
        opt_state = self.optimizer.init(params)
        self.state = TrainState(
            params=self._replicate(params),
            opt_state=self._replicate(opt_state),
        )

    # -- preemption-safe full training state (params + opt state + step) --
    def save_train_state(self, path: str, epoch: int) -> None:
        """Full resumable snapshot — params, optimiser state, step and
        epoch.  Designed for preemptible TPU pods (the reference has no
        preemption story; SURVEY.md §5.3)."""
        import orbax.checkpoint as ocp

        assert self.state is not None
        path = os.path.abspath(path)
        if self._global_sharded_state():
            # multi-host sharded (FSDP/TP) state: device_get would
            # fail on non-addressable arrays — hand orbax the LIVE
            # global jax.Arrays and each process writes exactly its
            # addressable shards (orbax's global-array path)
            grab = lambda t: t  # noqa: E731
        else:
            grab = jax.device_get
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": grab(self.state.params),
            "opt_state": grab(self.state.opt_state),
            "meta": {
                "step": np.asarray(self.state.step),
                "epoch": np.asarray(epoch),
            },
        }
        if self.averaging is not None:
            # SWA/EMA running average must survive preemption too
            # (count 0 = not yet seeded; restore leaves it unseeded)
            seeded = self._avg_params is not None
            payload["avg"] = {
                "params": grab(
                    self._avg_params if seeded else self.state.params
                ),
                "count": np.asarray(
                    float(self._avg_count) if seeded else 0.0
                ),
            }
        # collective under multi-host: every process calls save (orbax
        # syncs internally; only the primary host writes the arrays)
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def _global_sharded_state(self) -> bool:
        """True when the train state spans non-addressable devices —
        checkpointing must then go through orbax's global-array path."""
        return (
            jax.process_count() > 1
            and self.param_sharding != "replicated"
        )

    def load_train_state(
        self, path: str, example_batch: EventBatch
    ) -> int:
        """Restore a full snapshot; returns the epoch to resume from.

        Multi-host: collective (every process must call it).  For
        sharded (FSDP/TP) state each process reads exactly its
        addressable shards into the live sharded layout; for replicated
        state every process reads the full arrays — either way the
        checkpoint directory must be on a filesystem all hosts can
        read."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        params_t = self.model.init(
            {
                "params": jax.random.PRNGKey(self.seed),
                "dropout": self._dropout_rng,
            },
            example_batch,
        )
        opt_t = self.optimizer.init(params_t)
        presharded = self._global_sharded_state()
        if presharded:
            # global-array restore: target leaves are abstract
            # shape/dtype/sharding skeletons in the final sharded
            # layout; orbax restores straight into it (no host-side
            # full copy, no later _replicate)
            def abstract(tree):
                return jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(
                        x.shape, x.dtype, sharding=x.sharding
                    ),
                    self._replicate(tree),
                )

            skel_p, skel_o = abstract(params_t), abstract(opt_t)
        else:
            skel_p = jax.device_get(params_t)
            skel_o = jax.device_get(opt_t)
        target = {
            "params": skel_p,
            "opt_state": skel_o,
            "meta": {
                "step": np.asarray(0),
                "epoch": np.asarray(0),
            },
        }
        # averaging state is present iff the saving run had averaging on
        # (structure mismatch from a changed averaging setting surfaces
        # as the RuntimeError below, like any other config change)
        has_avg = self.averaging is not None
        if has_avg:
            target["avg"] = {
                "params": skel_p,
                "count": np.asarray(0.0),
            }
        ckptr = ocp.StandardCheckpointer()
        try:
            restored = ckptr.restore(path, target=target)
        except ValueError as e:
            raise RuntimeError(
                "Training-state checkpoint does not match this Trainer's "
                "optimizer configuration — resume requires the same "
                "optimizer/schedule/clip_grad_norm settings as the run "
                f"that saved {path!r}."
            ) from e
        rep = (lambda t: t) if presharded else self._replicate
        self.state = TrainState(
            params=rep(restored["params"]),
            opt_state=rep(restored["opt_state"]),
            step=int(restored["meta"]["step"]),
        )
        if has_avg and float(restored["avg"]["count"]) > 0:
            self._avg_params = rep(restored["avg"]["params"])
            self._avg_count = int(restored["avg"]["count"])
        return int(restored["meta"]["epoch"])

    def save_state_dict(self, path: str) -> None:
        """Single-file params snapshot (analogue of reference
        ``Model.save_state_dict``, ``model.py:49-60``)."""
        import pickle

        assert self.state is not None
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.state.params), f)

    def save_model(self, directory: str) -> None:
        """Write ``model.yml`` + ``state_dict.pkl`` under ``directory`` —
        the version-safe config+state-dict pattern (reference
        ``examples/04_training/01_train_dynedge.py:172-180``), loadable by
        :class:`~graphnet_tpu.deployment.deployment_module.DeploymentModule`.
        """
        import os

        from graphnet_tpu.utils.config import save_model_config

        os.makedirs(directory, exist_ok=True)
        save_model_config(self.model, os.path.join(directory, "model.yml"))
        self.save_state_dict(os.path.join(directory, "state_dict.pkl"))

    def load_state_dict(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            params = pickle.load(f)
        opt_state = self.optimizer.init(params)
        self.state = TrainState(
            params=self._replicate(params),
            opt_state=self._replicate(opt_state),
        )
