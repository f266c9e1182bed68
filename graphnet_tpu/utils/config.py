"""YAML config system (mirror of reference
``src/graphnet/utilities/config/``).

The reference serialises arbitrary lambdas as ``'!lambda ...'`` strings and
``eval``s them back behind a ``trust=True`` gate
(``model_config.py:36-315``).  This framework replaces that with a
**registry of named transforms** — configs are pure data, deserialisation
never executes strings, and no trust flag is needed.

Three pieces:
  * ``ModelConfig``: ``{class_name, arguments}``, recursive over nested
    components (detector → nodes → graph definition → backbone → tasks);
  * a class registry auto-populated with every framework component;
  * ``save_config``/``capture_config``/``build`` for round-tripping.
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import yaml

# ---------------------------------------------------------------------------
# Registries
# ---------------------------------------------------------------------------

CLASS_REGISTRY: Dict[str, type] = {}
TRANSFORM_REGISTRY: Dict[str, Callable] = {}


def register_class(cls: type, name: Optional[str] = None) -> type:
    CLASS_REGISTRY[name or cls.__name__] = cls
    return cls


def register_transform(name: str, fn: Callable) -> None:
    TRANSFORM_REGISTRY[name] = fn
    setattr(fn, "_config_name", name)


def _register_builtin_transforms() -> None:
    import jax
    import jax.numpy as jnp

    register_transform("log10", lambda x: jnp.log10(x))
    register_transform("pow10", lambda x: jnp.power(10.0, x))
    register_transform("log", lambda x: jnp.log(x))
    register_transform("exp", lambda x: jnp.exp(x))
    register_transform("identity", lambda x: x)
    register_transform("cosh", lambda x: jnp.cosh(x))
    register_transform("arccosh", lambda x: jnp.arccosh(x))
    # transforms appearing in reference zoo/example configs
    # (weight_port._LAMBDA_TABLE) — registered here so models SAVED after
    # porting load in a fresh process
    register_transform("log10_half", lambda x: jnp.log10(x) / 2.0)
    register_transform("pow10_double", lambda x: jnp.power(10.0, 2.0 * x))
    register_transform("softmax", lambda x: jax.nn.softmax(x, axis=-1))


_register_builtin_transforms()


def _register_framework_classes() -> None:
    """Populate the class registry with every public framework component."""
    import graphnet_tpu.models.detector as det
    import graphnet_tpu.models.graphs.graphs as graphs
    import graphnet_tpu.models.graphs.graph_definition as graph_definition
    import graphnet_tpu.models.graphs.nodes as nodes
    import graphnet_tpu.models.graphs.edges as edges
    from graphnet_tpu.models.detector.detector import _DETECTOR_REGISTRY
    import graphnet_tpu.models.gnn.convnet as convnet
    import graphnet_tpu.models.gnn.dynedge as dynedge
    import graphnet_tpu.models.gnn.dynedge_jinst as jinst
    import graphnet_tpu.models.gnn.dynedge_kaggle_tito as tito
    import graphnet_tpu.models.gnn.icemix as icemix
    import graphnet_tpu.models.gnn.particlenet as particlenet
    import graphnet_tpu.models.gnn.rnn_tito as rnn_tito
    import graphnet_tpu.models.rnn.node_rnn as node_rnn
    import graphnet_tpu.models.standard_model as sm
    import graphnet_tpu.models.task.classification as cls_tasks
    import graphnet_tpu.models.task.reconstruction as rec_tasks
    import graphnet_tpu.models.task.task as task_base
    import graphnet_tpu.models.transformer.iseecube as iseecube
    import graphnet_tpu.training.loss_functions as losses

    import graphnet_tpu.data.dataset as dataset_mod
    import graphnet_tpu.data.parquet_dataset as parquet_dataset
    import graphnet_tpu.data.sqlite_dataset as sqlite_dataset
    import graphnet_tpu.training.labels as labels

    for mod in (
        graphs,
        graph_definition,
        nodes,
        edges,
        convnet,
        dynedge,
        jinst,
        tito,
        icemix,
        particlenet,
        rnn_tito,
        node_rnn,
        sm,
        cls_tasks,
        rec_tasks,
        task_base,
        losses,
        iseecube,
        dataset_mod,
        sqlite_dataset,
        parquet_dataset,
        labels,
    ):
        for name, obj in vars(mod).items():
            if inspect.isclass(obj) and obj.__module__ == mod.__name__:
                register_class(obj, name)
    for name, cls in _DETECTOR_REGISTRY.items():
        register_class(cls, name)
    # the `Prometheus` alias (= ORCA150SuperDense, reference
    # `detector/prometheus.py:365`) is not a registry entry of its own
    import graphnet_tpu.models.detector.prometheus as prom

    register_class(prom.Prometheus, "Prometheus")


# ---------------------------------------------------------------------------
# Config capture
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ModelConfig:
    """Serializable description of a component tree."""

    class_name: str
    arguments: Dict[str, Any]

    def as_dict(self) -> Dict[str, Any]:
        return {
            "class_name": self.class_name,
            "arguments": _encode(self.arguments),
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.as_dict(), f, sort_keys=False)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        return cls(
            class_name=d["class_name"], arguments=d["arguments"]
        )

    @classmethod
    def load(cls, path: str) -> "ModelConfig":
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))


def _encode(value: Any) -> Any:
    """Encode python values to YAML-safe structures."""
    if value is None or isinstance(value, (str, bool)):
        return value
    if isinstance(value, (np.integer, int)):
        return int(value)
    if isinstance(value, (np.floating, float)):
        return float(value)
    if isinstance(value, ModelConfig):
        return {"__model__": value.as_dict()}
    if isinstance(value, dict):
        return {k: _encode(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    if inspect.isfunction(value) or inspect.isbuiltin(value):
        name = getattr(value, "_config_name", None)
        if name is None:
            raise ValueError(
                f"Cannot serialise unregistered callable {value!r}; "
                "register it with register_transform()."
            )
        return {"__transform__": name}
    # any other object: capture it as a nested component
    return {"__model__": capture_config(value).as_dict()}


def _decode(value: Any) -> Any:
    if isinstance(value, dict):
        if "__model__" in value:
            return build(ModelConfig.from_dict(value["__model__"]))
        if "__transform__" in value:
            return TRANSFORM_REGISTRY[value["__transform__"]]
        return {k: _decode(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


def capture_config(obj: Any) -> ModelConfig:
    """Derive a ModelConfig from an object.

    flax modules are dataclasses: their fields are the config.  Other
    classes must have used the :func:`save_config` decorator (which stashes
    constructor kwargs on the instance).
    """
    if hasattr(obj, "_captured_config"):
        return obj._captured_config
    if dataclasses.is_dataclass(obj):
        args = {}
        for f in dataclasses.fields(obj):
            if f.name in ("parent", "name"):
                continue
            args[f.name] = getattr(obj, f.name)
        return ModelConfig(
            class_name=type(obj).__name__, arguments=args
        )
    # objects whose constructor takes no arguments need no capture
    sig = inspect.signature(type(obj).__init__)
    if list(sig.parameters) == ["self"] or (
        type(obj).__init__ is object.__init__
    ):
        return ModelConfig(class_name=type(obj).__name__, arguments={})
    raise TypeError(
        f"Cannot capture config of {type(obj).__name__}; use @save_config."
    )


def save_config(init: Callable) -> Callable:
    """Decorator for non-dataclass ``__init__``s: capture kwargs into
    ``self._captured_config`` (analogue of the reference's
    ``ModelConfigSaverMeta``, ``model_config.py:317-349``)."""

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        captured = {
            k: v
            for k, v in bound.arguments.items()
            if k not in ("self",)
        }
        captured.update(captured.pop("kwargs", {}))
        # first capture wins: a subclass constructor that delegates to a
        # decorated base-class constructor must not be overwritten by it
        if not hasattr(self, "_captured_config"):
            self._captured_config = ModelConfig(
                class_name=type(self).__name__, arguments=captured
            )
        return init(self, *args, **kwargs)

    return wrapper


def build(config: ModelConfig) -> Any:
    """Instantiate a component tree from a config (no code execution)."""
    if not CLASS_REGISTRY:
        _register_framework_classes()
    if config.class_name not in CLASS_REGISTRY:
        _register_framework_classes()
    cls = CLASS_REGISTRY[config.class_name]
    args = {k: _decode(v) for k, v in config.arguments.items()}
    # flax dataclasses want tuples for sequence fields
    if dataclasses.is_dataclass(cls):
        field_types = {f.name: f for f in dataclasses.fields(cls)}
        for k, v in args.items():
            if isinstance(v, list):
                args[k] = _tuplify(v)
    return cls(**args)


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def save_model_config(model: Any, path: str) -> None:
    capture_config(model).dump(path)


# ---------------------------------------------------------------------------
# Dataset configs (analogue of reference
# ``utilities/config/dataset_config.py:32``)
# ---------------------------------------------------------------------------


def save_dataset_config(dataset: Any, path: str) -> None:
    """Dump a dataset (constructor args incl. nested graph definition and
    label functions) to YAML."""
    capture_config(dataset).dump(path)


def load_dataset(path: str) -> Any:
    """Rebuild dataset(s) from a dataset-config YAML.

    Mirrors the reference's ``Dataset.from_config`` semantics
    (``utilities/config/dataset_config.py:60-140``):

      * plain selection → one Dataset;
      * ``selection: {name: sel}`` dict → ``{name: Dataset}``;
      * ``selection: {name: [sel, sel, ...]}`` → ``{name: EnsembleDataset}``.
    """
    if not CLASS_REGISTRY:
        _register_framework_classes()
    cfg = ModelConfig.load(path)
    selection = cfg.arguments.get("selection")
    if isinstance(selection, dict):
        return {
            name: _build_dataset_with_selection(cfg, sel)
            for name, sel in selection.items()
        }
    return build(cfg)


def _build_dataset_with_selection(cfg: ModelConfig, selection: Any) -> Any:
    from graphnet_tpu.data.dataset import EnsembleDataset

    def one(sel):
        return build(
            ModelConfig(
                class_name=cfg.class_name,
                arguments={**cfg.arguments, "selection": sel},
            )
        )

    # a list of per-dataset selections (each itself a string or id-list)
    # becomes an ensemble; a flat list of event ids is a single selection
    if (
        isinstance(selection, list)
        and selection
        and isinstance(selection[0], (list, str))
    ):
        return EnsembleDataset([one(s) for s in selection])
    return one(selection)


# ---------------------------------------------------------------------------
# Training config (analogue of reference
# ``utilities/config/training_config.py:8``)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainingConfig:
    """Training hyper-parameters as data: target(s), early stopping,
    ``Trainer.fit`` kwargs and dataloader kwargs."""

    target: Any
    early_stopping_patience: int = 5
    fit: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dataloader: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f, sort_keys=False)

    @classmethod
    def load(cls, path: str) -> "TrainingConfig":
        with open(path) as f:
            return cls(**yaml.safe_load(f))


def load_model(path: str) -> Any:
    if not CLASS_REGISTRY:
        _register_framework_classes()
    return build(ModelConfig.load(path))


def save_model(model: Any, params: Any, directory: str) -> None:
    """Save a model as config.yml + state_dict.pkl in ``directory`` — the
    version-safe persistence pattern of the reference
    (``examples/04_training/01_train_dynedge.py:172-180``)."""
    import os
    import pickle

    import jax

    os.makedirs(directory, exist_ok=True)
    save_model_config(model, os.path.join(directory, "config.yml"))
    with open(os.path.join(directory, "state_dict.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)


def load_saved_model(directory: str):
    """Load (model, params) saved by :func:`save_model`."""
    import os
    import pickle

    model = load_model(os.path.join(directory, "config.yml"))
    with open(os.path.join(directory, "state_dict.pkl"), "rb") as f:
        params = pickle.load(f)
    return model, params
