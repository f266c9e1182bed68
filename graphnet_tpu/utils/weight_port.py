"""Torch→flax weight porting and reference-config translation.

Bridges trained artifacts of the reference (GraphNeT) to this framework
(SURVEY.md §7 step 2):

  * :func:`port_dynedge_state_dict` maps a reference ``StandardModel``
    state_dict (DynEdge backbone, ``gnn/dynedge.py:190-210`` Sequential
    layout) onto our flax parameter tree, including the *linearised* first
    EdgeConv layer: since ``cat[x_i, x_j - x_i] @ [W1; W2]^T =
    x_i @ (W1 - W2)^T + x_j @ W2^T``, the torch first-linear weight
    ``[h, 2d]`` splits into ``self_dense.kernel = (W1 - W2)^T`` and
    ``nbr_dense.kernel = W2^T`` (``models/components/layers.py:92-98``).

  * :func:`from_reference_config` instantiates our components from the
    reference's ModelConfig YAML (``utilities/config/model_config.py:36``)
    WITHOUT evaluating code: ``'!lambda ...'`` strings are looked up in a
    table of known physics transforms and ``'!class ...'`` optimizer
    references are ignored (optimisation is the Trainer's concern here).

Together these let a user load the reference's pretrained zoo
(``src/graphnet/models/pretrained/icecube/.../*_config.yml`` +
``*_state_dict.pth``) and serve it from this framework.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# state_dict porting
# ---------------------------------------------------------------------------


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor, without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _normalise_keys(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """numpy-ify values; apply the reference's ``_gnn -> backbone``
    migration (``models/model.py:49-79``); drop non-parameter buffers."""
    out = {}
    for k, v in state_dict.items():
        k = re.sub(r"^_gnn\.", "backbone.", k)
        out[k] = _to_numpy(v)
    return out


def port_dynedge_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference DynEdge-StandardModel state_dict onto a flax
    parameter tree.

    Args:
        state_dict: torch ``model.state_dict()`` (tensors or arrays) with
            reference key names (``backbone._conv_layers.{i}.nn.{j}.*``,
            ``backbone._post_processing.{j}.*``, ``backbone._readout.{j}.*``,
            ``_tasks.{t}._affine.*``).
        template: params pytree from ``model.init`` of the matching
            :class:`~graphnet_tpu.models.standard_model.StandardModel` —
            provides the expected tree structure and shapes.

    Returns:
        A new params dict with every leaf filled from the state_dict.
    """
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    _port_dynedge_backbone(sd, take, "backbone", root["backbone"])
    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def _port_tasks(sd, take, root) -> None:
    """Reference task heads (``_tasks.{t}._affine``, ``task/task.py:251``)
    → our ``tasks_{t}/affine``."""
    task_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"_tasks\.(\d+)\._affine\.weight$", k))
        }
    )
    for t in task_ids:
        w = take(f"_tasks.{t}._affine.weight")
        b = take(f"_tasks.{t}._affine.bias")
        _fill(root[f"tasks_{t}"]["affine"], "kernel", w.T)
        _fill(root[f"tasks_{t}"]["affine"], "bias", b)


def _check_unused(sd, used) -> None:
    unused_params = [
        k
        for k in sd
        if k not in used
        and ("weight" in k or "bias" in k)
        # graph building is host-side in our design; its torch buffers
        # (e.g. detector scaling constants) have no flax counterpart
        and not k.startswith("_graph_definition")
    ]
    if unused_params:
        raise ValueError(
            f"unported parameter keys in state_dict: {unused_params}"
        )


def port_jinst_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference DynEdgeJINST-StandardModel state_dict
    (``gnn/dynedge_jinst.py:50-103``: ``conv_add{1..4}.nn.{0,2}`` 2-layer
    LeakyReLU MLPs, post-processing Linears ``nn1``/``nn2``/``nn3``) onto
    our flax tree, linearising each first EdgeConv layer exactly as
    :func:`port_dynedge_state_dict` does."""
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    bb = root["backbone"]
    for i in (1, 2, 3, 4):
        prefix = f"backbone.conv_add{i}.nn"
        lin_ids, _ = _sequential_positions(sd, prefix)
        assert len(lin_ids) == 2, f"expected 2 linears under {prefix}"
        conv = bb[f"conv_add{i}"]["conv"]
        w = take(f"{prefix}.{lin_ids[0]}.weight")
        b = take(f"{prefix}.{lin_ids[0]}.bias")
        d_in = w.shape[1] // 2
        w1, w2 = w[:, :d_in], w[:, d_in:]
        _fill(conv["self_dense"], "kernel", (w1 - w2).T)
        _fill(conv["self_dense"], "bias", b)
        _fill(conv["nbr_dense"], "kernel", w2.T)
        _fill(conv, "out_kernel", take(f"{prefix}.{lin_ids[1]}.weight").T)
        _fill(conv, "out_bias", take(f"{prefix}.{lin_ids[1]}.bias"))

    for name in ("nn1", "nn2", "nn3"):
        _fill(bb[name], "kernel", take(f"backbone.{name}.weight").T)
        _fill(bb[name], "bias", take(f"backbone.{name}.bias"))

    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def port_convnet_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference ConvNet-StandardModel state_dict
    (``gnn/convnet.py:44-63``: 3× PyG ``TAGConv`` with per-hop ``lins``,
    ``batchnorm1``, ``linear{1..5}``, ``out``) onto our flax tree.

    TAGConv biases: ``Σ_h (W_h x_h + b_h) = Σ_h W_h x_h + Σ_h b_h``, so
    every torch bias (per-hop ``lins.{h}.bias`` and/or a single module
    ``bias``, depending on the PyG version) is summed into our ``lin_0``
    bias — the only hop that carries one.

    ``batchnorm1`` running averages are filled into ``bn_mean``/``bn_var``
    when the template has them — i.e. when it came from
    ``ConvNet(frozen_batchnorm=True)``, the torch eval-mode semantics.
    """
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    bb = root["backbone"]
    for i in (1, 2, 3):
        prefix = f"backbone.conv{i}"
        hop_ids = sorted(
            int(m.group(1))
            for k in sd
            if (
                m := re.match(
                    rf"{re.escape(prefix)}\.lins\.(\d+)\.weight$", k
                )
            )
        )
        assert hop_ids, f"no TAGConv `lins` under {prefix}"
        conv = bb[f"conv{i}"]
        total_bias = None
        for h in hop_ids:
            _fill(
                conv[f"lin_{h}"],
                "kernel",
                take(f"{prefix}.lins.{h}.weight").T,
            )
            bk = f"{prefix}.lins.{h}.bias"
            if bk in sd:
                b = take(bk)
                total_bias = b if total_bias is None else total_bias + b
        if f"{prefix}.bias" in sd:  # single-bias PyG layout
            b = take(f"{prefix}.bias")
            total_bias = b if total_bias is None else total_bias + b
        if total_bias is None:
            total_bias = np.zeros(
                np.shape(conv["lin_0"]["bias"]), np.float32
            )
        _fill(conv["lin_0"], "bias", total_bias)

    _fill(bb, "bn_scale", take("backbone.batchnorm1.weight"))
    _fill(bb, "bn_bias", take("backbone.batchnorm1.bias"))
    if "bn_mean" in bb:
        _fill(bb, "bn_mean", take("backbone.batchnorm1.running_mean"))
        _fill(bb, "bn_var", take("backbone.batchnorm1.running_var"))
    elif "backbone.batchnorm1.running_mean" in sd:
        import warnings

        warnings.warn(
            "state_dict carries batchnorm1 running statistics but the "
            "template has no bn_mean/bn_var params — eval predictions "
            "will NOT reproduce torch. Build the template from "
            "ConvNet(frozen_batchnorm=True).",
            stacklevel=2,
        )

    for name in ("linear1", "linear2", "linear3", "linear4", "linear5", "out"):
        _fill(bb[name], "kernel", take(f"backbone.{name}.weight").T)
        _fill(bb[name], "bias", take(f"backbone.{name}.bias"))

    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def port_particlenet_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference ParticleNeT-StandardModel state_dict
    (``gnn/particlenet.py:176-222``: ``_conv_layers.{i}.nn`` =
    ``[Linear, BatchNorm1d, act]*n`` Sequentials, ``_readout`` =
    ``[Linear, act, Dropout]*m``) onto our flax tree.

    First conv layers are linearised (self/neighbour split, see
    :func:`port_dynedge_state_dict`); BatchNorm running averages fill the
    frozen ``mean``/``var`` params when the template came from
    ``ParticleNeT(frozen_batchnorm=True)``."""
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    bb = root["backbone"]
    conv_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"backbone\._conv_layers\.(\d+)\.", k))
        }
    )
    assert conv_ids, "no `backbone._conv_layers.*` keys found"
    for i in conv_ids:
        prefix = f"backbone._conv_layers.{i}.nn"
        lin_ids, bn_ids = _sequential_positions(sd, prefix)
        assert lin_ids, f"no linear layers under {prefix}"
        conv = bb[f"conv_{i}"]
        w = take(f"{prefix}.{lin_ids[0]}.weight")
        b = take(f"{prefix}.{lin_ids[0]}.bias")
        d_in = w.shape[1] // 2
        w1, w2 = w[:, :d_in], w[:, d_in:]
        _fill(conv["self_dense"], "kernel", (w1 - w2).T)
        _fill(conv["self_dense"], "bias", b)
        _fill(conv["nbr_dense"], "kernel", w2.T)
        for j, lid in enumerate(lin_ids[1:], start=1):
            _fill(
                conv[f"dense_{j}"],
                "kernel",
                take(f"{prefix}.{lid}.weight").T,
            )
            _fill(conv[f"dense_{j}"], "bias", take(f"{prefix}.{lid}.bias"))
        for j, nid in enumerate(bn_ids):
            bn = conv[f"bn_{j}"]
            _fill(bn, "scale", take(f"{prefix}.{nid}.weight"))
            _fill(bn, "bias", take(f"{prefix}.{nid}.bias"))
            if "mean" in bn:
                _fill(bn, "mean", take(f"{prefix}.{nid}.running_mean"))
                _fill(bn, "var", take(f"{prefix}.{nid}.running_var"))
            elif f"{prefix}.{nid}.running_mean" in sd:
                import warnings

                warnings.warn(
                    "state_dict carries BatchNorm running statistics "
                    "but the template has no frozen mean/var params — "
                    "eval predictions will NOT reproduce torch. Build "
                    "the template from "
                    "ParticleNeT(frozen_batchnorm=True).",
                    stacklevel=2,
                )

    readout_ids, _ = _sequential_positions(sd, "backbone._readout")
    for j, lid in enumerate(readout_ids):
        _fill(
            bb[f"readout_{j}"],
            "kernel",
            take(f"backbone._readout.{lid}.weight").T,
        )
        _fill(
            bb[f"readout_{j}"],
            "bias",
            take(f"backbone._readout.{lid}.bias"),
        )

    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def _sequential_positions(sd, prefix):
    """(linear_positions, norm_positions) of a torch ``Sequential`` under
    ``prefix`` — Linears have 2-D weights, LayerNorms 1-D."""
    seq = {}
    for k in sd:
        m = re.match(rf"{re.escape(prefix)}\.(\d+)\.weight$", k)
        if m:
            seq[int(m.group(1))] = sd[k].ndim
    lin = sorted(p for p, nd in seq.items() if nd == 2)
    norm = sorted(p for p, nd in seq.items() if nd == 1)
    return lin, norm


def _port_mlp_head(sd, take, prefix, node) -> None:
    """Torch ``Sequential([Linear, (LayerNorm), act] * n)`` → our
    :class:`~graphnet_tpu.models.components.layers.MLP`
    (``dense_{j}`` / ``norm_{j}``)."""
    lin_ids, norm_ids = _sequential_positions(sd, prefix)
    for j, lid in enumerate(lin_ids):
        _fill(node[f"dense_{j}"], "kernel", take(f"{prefix}.{lid}.weight").T)
        _fill(node[f"dense_{j}"], "bias", take(f"{prefix}.{lid}.bias"))
        if norm_ids:
            nid = norm_ids[j]
            _fill(node[f"norm_{j}"], "scale", take(f"{prefix}.{nid}.weight"))
            _fill(node[f"norm_{j}"], "bias", take(f"{prefix}.{nid}.bias"))


def _port_dynedge_backbone(sd, take, bb_prefix, bb_node) -> None:
    """Port a reference DynEdge backbone (``gnn/dynedge.py:190-249``
    Sequential layout, with or without ``add_norm_layer``) rooted at
    ``bb_prefix`` in the state_dict onto our flax DynEdge subtree.

    Handles the linearised first EdgeConv layer (see module docstring) and
    the flax layout differences: with norms the first LayerNorm lives at
    ``conv.norm_0`` and later ones inside the ``nn`` MLP; without norms
    2-layer convs use the fused-kernel params ``out_kernel``/``out_bias``.
    """
    conv_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (
                m := re.match(
                    rf"{re.escape(bb_prefix)}\._conv_layers\.(\d+)\.", k
                )
            )
        }
    )
    assert conv_ids, (
        f"no `{bb_prefix}._conv_layers.*` keys found — is this a DynEdge "
        f"state_dict? keys: {sorted(sd)[:5]}..."
    )
    for i in conv_ids:
        prefix = f"{bb_prefix}._conv_layers.{i}.nn"
        lin_ids, norm_ids = _sequential_positions(sd, prefix)
        assert lin_ids, f"no linear layers under {prefix}"
        conv = bb_node[f"conv_{i}"]["conv"]
        # first linear: split [h, 2d] into self/neighbour terms
        w = take(f"{prefix}.{lin_ids[0]}.weight")
        b = take(f"{prefix}.{lin_ids[0]}.bias")
        d_in = w.shape[1] // 2
        w1, w2 = w[:, :d_in], w[:, d_in:]
        _fill(conv["self_dense"], "kernel", (w1 - w2).T)
        _fill(conv["self_dense"], "bias", b)
        _fill(conv["nbr_dense"], "kernel", w2.T)
        if norm_ids:
            _fill(conv["norm_0"], "scale", take(f"{prefix}.{norm_ids[0]}.weight"))
            _fill(conv["norm_0"], "bias", take(f"{prefix}.{norm_ids[0]}.bias"))
        # remaining linears (+ norms)
        for j, lid in enumerate(lin_ids[1:]):
            w = take(f"{prefix}.{lid}.weight")
            b = take(f"{prefix}.{lid}.bias")
            if "out_kernel" in conv and len(lin_ids) == 2 and not norm_ids:
                _fill(conv, "out_kernel", w.T)
                _fill(conv, "out_bias", b)
            else:
                _fill(conv["nn"][f"dense_{j}"], "kernel", w.T)
                _fill(conv["nn"][f"dense_{j}"], "bias", b)
                if norm_ids:
                    nid = norm_ids[j + 1]
                    _fill(
                        conv["nn"][f"norm_{j}"],
                        "scale",
                        take(f"{prefix}.{nid}.weight"),
                    )
                    _fill(
                        conv["nn"][f"norm_{j}"],
                        "bias",
                        take(f"{prefix}.{nid}.bias"),
                    )

    for torch_name, flax_name in (
        ("_post_processing", "post_processing"),
        ("_readout", "readout"),
    ):
        if flax_name not in bb_node:
            # skip_readout backbones (e.g. inside DeepIce) have no flax
            # readout, but torch builds `_readout` unconditionally
            # (`dynedge.py:244-249`) — mark its keys consumed
            for k in list(sd):
                if k.startswith(f"{bb_prefix}.{torch_name}."):
                    take(k)
            continue
        _port_mlp_head(
            sd, take, f"{bb_prefix}.{torch_name}", bb_node[flax_name]
        )


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    try:  # FrozenDict
        from flax.core import FrozenDict

        if isinstance(tree, FrozenDict):
            return {k: _copy_tree(v) for k, v in tree.items()}
    except Exception:
        pass
    return tree


def _fill(node: Dict[str, Any], key: str, value: np.ndarray) -> None:
    import jax.numpy as jnp

    assert key in node, f"flax template has no leaf {key!r} at {sorted(node)}"
    expect = np.shape(node[key])
    assert tuple(value.shape) == tuple(expect), (
        f"shape mismatch for {key}: torch {value.shape} vs flax {expect}"
    )
    node[key] = jnp.asarray(value, jnp.float32)


# ---------------------------------------------------------------------------
# reference-config translation (no eval)
# ---------------------------------------------------------------------------

# known physics transforms appearing in reference zoo configs / examples —
# matched STRUCTURALLY (string table), never evaluated
_LAMBDA_TABLE = {
    "x: torch.log10(x)": "log10",
    "x: torch.pow(10,x)": "pow10",
    "x: torch.pow(10, x)": "pow10",
    "x: torch.log(x)": "log",
    "x: torch.exp(x)": "exp",
    "x: x": "identity",
    "x: torch.log10(x)/2.": "log10_half",
    "x: 10**(2*x)": "pow10_double",
    "x: torch.nn.functional.softmax(x, dim=-1)": "softmax",
    "x: torch.nn.functional.softmax(x,dim=-1)": "softmax",
}


def _resolve_lambda(s: str):
    from graphnet_tpu.utils.config import TRANSFORM_REGISTRY, register_transform

    body = s[len("!lambda") :].strip()
    if body not in _LAMBDA_TABLE:
        raise ValueError(
            f"Unknown reference lambda {s!r}; add it to "
            "weight_port._LAMBDA_TABLE with a registered transform."
        )
    name = _LAMBDA_TABLE[body]
    # every table entry is registered by
    # utils.config._register_builtin_transforms, so models saved after
    # porting reload in a fresh process
    return TRANSFORM_REGISTRY[name]


# reference arguments that have no meaning in this framework (training glue
# handled by our Trainer, torch dtypes, hidden sizes inferred by flax)
_DROP_ARGS = {
    "optimizer_class",
    "optimizer_kwargs",
    "scheduler_class",
    "scheduler_config",
    "scheduler_kwargs",
    "dtype",
    "hidden_size",
}

# reference class name -> our class name, where they differ
_CLASS_ALIASES = {
    "IceCubeKaggle": "IceCubeKaggle",
}


def _translate(value: Any) -> Any:
    from graphnet_tpu.utils.config import CLASS_REGISTRY

    if isinstance(value, dict) and "ModelConfig" in value:
        return _build_component(value["ModelConfig"])
    if isinstance(value, dict) and {"class_name", "arguments"} <= set(value):
        return _build_component(value)
    if isinstance(value, dict):
        return {k: _translate(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_translate(v) for v in value]
    if isinstance(value, str) and value.startswith("!lambda"):
        return _resolve_lambda(value)
    if isinstance(value, str) and value.startswith("!class"):
        return None  # torch classes (optimizers etc.) have no counterpart
    return value


def _build_component(cfg: Dict[str, Any]) -> Any:
    """Instantiate one of OUR classes from a reference ModelConfig dict."""
    import dataclasses
    import inspect

    from graphnet_tpu.utils.config import (
        CLASS_REGISTRY,
        _register_framework_classes,
    )

    if not CLASS_REGISTRY:
        _register_framework_classes()
    name = _CLASS_ALIASES.get(cfg["class_name"], cfg["class_name"])
    if name not in CLASS_REGISTRY:
        raise KeyError(
            f"Reference component {cfg['class_name']!r} has no counterpart "
            "class in graphnet_tpu"
        )
    cls = CLASS_REGISTRY[name]
    args = {}
    for k, v in (cfg.get("arguments") or {}).items():
        if k in _DROP_ARGS:
            continue
        tv = _translate(v)
        args[k] = tv

    # keep only arguments our constructor knows; None means "use default"
    if dataclasses.is_dataclass(cls):
        known = {f.name for f in dataclasses.fields(cls)}
    else:
        known = set(inspect.signature(cls.__init__).parameters)
    # a KNNGraph config stores k/columns inside its captured
    # `edge_definition` (the reference constructor builds KNNEdges itself,
    # `graphs/graphs.py:13-58`); fold them into the KNNGraph arguments so
    # a non-default k survives translation
    if name == "KNNGraph" and "edge_definition" in args:
        ed = args.pop("edge_definition")
        if type(ed).__name__ == "KNNEdges":
            args.setdefault(
                "nb_nearest_neighbours", ed.nb_nearest_neighbours
            )
            args.setdefault("columns", tuple(ed.columns))
        elif ed is not None:
            import warnings

            warnings.warn(
                f"KNNGraph: non-KNN edge_definition "
                f"{type(ed).__name__} dropped in translation"
            )

    # flax reserves `nb_outputs` as a property on some backbones; the
    # constructor argument is `nb_outputs_` (e.g. ConvNet)
    if "nb_outputs" in args and "nb_outputs" not in known and (
        "nb_outputs_" in known
    ):
        args["nb_outputs_"] = args.pop("nb_outputs")
    dropped = {k for k in args if k not in known}
    # None normally means "use the default" (our defaults mirror the
    # reference's) — EXCEPT `global_pooling_schemes`, where the reference
    # default is None itself and an explicit null means "no pooling,
    # node-level readout" (`dynedge.py` global_pooling_schemes=None);
    # our flax default is the 4-scheme tuple, so the null must survive
    keep_none = {"global_pooling_schemes"}
    args = {
        k: v
        for k, v in args.items()
        if k in known and (v is not None or k in keep_none)
    }
    # flax dataclasses want tuples; plain classes keep lists (some
    # concatenate them with list literals, e.g. IceMixNodes)
    if dataclasses.is_dataclass(cls):
        for k, v in list(args.items()):
            if isinstance(v, list):
                args[k] = _tuplify_lists(v)
    if "target_labels" in args and isinstance(args["target_labels"], str):
        args["target_labels"] = (args["target_labels"],)
    # the reference accepts a bare string for one pooling scheme
    if isinstance(args.get("global_pooling_schemes"), str):
        args["global_pooling_schemes"] = (args["global_pooling_schemes"],)
    # a hand-written DynEdge config may OMIT global_pooling_schemes
    # entirely; the reference constructor default is None (node-level)
    # while our flax default is the 4-scheme tuple — inject the
    # reference default so translation matches (reference
    # ModelConfig YAMLs always record every argument, so zoo configs
    # never hit this)
    if (
        name == "DynEdge"
        and "global_pooling_schemes" in known
        and "global_pooling_schemes" not in args
    ):
        args["global_pooling_schemes"] = None
    obj = cls(**args)
    if dropped:
        import warnings

        warnings.warn(
            f"{name}: dropped reference-only arguments {sorted(dropped)}"
        )
    return obj


def _tuplify_lists(v):
    if isinstance(v, list):
        return tuple(_tuplify_lists(x) for x in v)
    return v


def from_reference_config(path: str) -> Tuple[Any, Optional[Any]]:
    """Instantiate ``(model, graph_definition)`` from a reference
    ModelConfig YAML (e.g. a pretrained-zoo ``*_config.yml``).

    The reference folds the graph definition into StandardModel; in this
    framework graph building is host-side, so it is returned separately
    (None if the config has none).
    """
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert cfg.get("class_name") in ("StandardModel",), (
        f"expected a StandardModel config, got {cfg.get('class_name')!r}"
    )
    arguments = dict(cfg["arguments"])
    gd_cfg = arguments.pop("graph_definition", None)
    graph_definition = _translate(gd_cfg) if gd_cfg is not None else None
    tasks = _translate(arguments.pop("tasks"))
    backbone = _translate(arguments.pop("backbone"))

    # a backbone that never pools emits node-level latents (the
    # reference's pulse-cleaner pattern, QUESO SplitInIcePulses_cleaner)
    # and so does one that skips the readout entirely (reference
    # dynedge.py returns x before pooling when skip_readout): its task
    # heads predict per node either way
    if not getattr(backbone, "global_pooling_schemes", True) or (
        getattr(backbone, "skip_readout", False)
    ):
        tasks = [
            t.clone(node_level=True) if hasattr(t, "node_level") else t
            for t in tasks
        ]

    from graphnet_tpu.models.standard_model import StandardModel

    model = StandardModel(backbone=backbone, tasks=tuple(tasks))
    return model, graph_definition


def frozen_stat_decay_mask(params: Any) -> Any:
    """Weight-decay mask (True = decay) excluding ported frozen BatchNorm
    statistics — ConvNet ``bn_mean``/``bn_var`` and MaskedBatchNorm
    ``mean``/``var``.

    Their gradients are already ``stop_gradient``-ed to zero, but
    *decoupled* weight decay (``optax.adamw`` / ``add_decayed_weights``)
    mutates every leaf regardless of gradient and would shrink the
    statistics toward zero during fine-tuning. Pass this as the
    optimiser's ``mask=`` when fine-tuning a ported ConvNet/ParticleNeT::

        optax.adamw(1e-4, mask=frozen_stat_decay_mask(params))
    """
    frozen = {"bn_mean", "bn_var", "mean", "var"}

    def mask(node):
        if isinstance(node, dict) or hasattr(node, "items"):
            return {
                k: (
                    False
                    if k in frozen
                    and not (isinstance(v, dict) or hasattr(v, "items"))
                    else mask(v)
                )
                for k, v in node.items()
            }
        return True

    return mask(params)


def from_reference_dataset_config(path: str) -> Any:
    """Build dataset(s) from a reference DatasetConfig YAML — the flat
    format of ``utilities/config/dataset_config.py:32`` (``path``,
    ``pulsemaps``, ``features``, ``truth``, ``selection``, nested
    ``graph_definition``), as shipped under ``configs/datasets/`` in the
    reference repo.

    Mirrors reference ``Dataset.from_config`` semantics
    (``dataset/dataset.py:107-190``): a plain selection gives one
    dataset, a ``{name: selection}`` dict gives ``{name: Dataset}``, and
    a named list of selections gives an EnsembleDataset per name. The
    ``$GRAPHNET`` path macro resolves against this repo's root (our
    bundled example data mirrors the reference layout). The backend is
    chosen from the path: SQLite for ``.db``/``.sqlite``, Parquet
    otherwise.
    """
    import yaml

    with open(path) as f:
        cfg = dict(yaml.safe_load(f))

    gd_cfg = cfg.pop("graph_definition", None)
    graph_definition = _translate(gd_cfg) if gd_cfg is not None else None
    data_path = cfg.pop("path")
    selection = cfg.pop("selection", None)

    from graphnet_tpu.data.parquet_dataset import ParquetDataset
    from graphnet_tpu.data.sqlite_dataset import SQLiteDataset

    first = data_path[0] if isinstance(data_path, list) else data_path
    cls = (
        SQLiteDataset
        if str(first).endswith((".db", ".sqlite", ".sqlite3"))
        else ParquetDataset
    )

    allowed = {
        "pulsemaps", "features", "truth", "node_truth", "index_column",
        "truth_table", "node_truth_table", "string_selection",
        "loss_weight_table", "loss_weight_column",
        "loss_weight_default_value", "seed",
    }
    kwargs = {k: v for k, v in cfg.items() if k in allowed and v is not None}
    ignored = sorted(k for k in cfg if k not in allowed and cfg[k] is not None)
    if ignored:
        import warnings

        warnings.warn(
            f"reference dataset config: ignored arguments {ignored}"
        )

    from graphnet_tpu.data.dataset import EnsembleDataset

    def one(sel):
        return cls(
            path=data_path,
            graph_definition=graph_definition,
            selection=sel,
            **kwargs,
        )

    def one_or_ensemble(sel):
        # only a list of selection STRINGS becomes an ensemble
        # (reference `dataset.py:131-137` checks isinstance(.., str));
        # any other list (flat event ids, list of id-lists) is passed
        # to a single dataset, mirroring reference Dataset.from_config
        if isinstance(sel, list) and sel and isinstance(sel[0], str):
            return EnsembleDataset([one(s) for s in sel])
        return one(sel)

    if isinstance(selection, dict):
        return {
            name: one_or_ensemble(sel) for name, sel in selection.items()
        }
    return one_or_ensemble(selection)


def port_reference_model(
    config_path: str,
    state_dict_path: str,
    example_n_pulses: int = 16,
) -> Tuple[Any, Optional[Any], Dict[str, Any]]:
    """One-call bridge: reference config YAML + torch state_dict →
    ``(model, graph_definition, flax_params)`` ready for
    :class:`~graphnet_tpu.deployment.deployment_module.DeploymentModule`
    or :class:`~graphnet_tpu.training.trainer.Trainer`.
    """
    import pickle

    import jax

    from graphnet_tpu.batch import make_batch

    model, graph_definition = from_reference_config(config_path)
    if state_dict_path.endswith((".pth", ".pt")):
        import torch

        state_dict = torch.load(
            state_dict_path, map_location="cpu", weights_only=True
        )
    else:
        with open(state_dict_path, "rb") as f:
            state_dict = pickle.load(f)

    d = getattr(model.backbone, "nb_inputs", None)
    if d is None:
        # DeepIce consumes raw features directly (FourierEncoder) and,
        # with include_dynedge, feeds the same columns to the nested
        # DynEdge (`gnn/icemix.py:135-139`)
        d = getattr(model.backbone, "n_features", 6)
        da = getattr(model.backbone, "dynedge_args", None) or {}
        d = max(d, da.get("nb_inputs", 0))
    rng = np.random.default_rng(0)
    events = [
        rng.standard_normal((example_n_pulses, d)).astype(np.float32)
        for _ in range(2)
    ]
    backbone_cls = type(model.backbone).__name__
    if backbone_cls in ("ConvNet", "ParticleNeT") and getattr(
        model.backbone, "add_batchnorm_layer", True
    ):
        # trained torch checkpoints carry BatchNorm running averages;
        # serve them with eval-mode (frozen) statistics
        model = model.clone(
            backbone=model.backbone.clone(frozen_batchnorm=True)
        )
    template = model.init(jax.random.PRNGKey(0), make_batch(events))
    if backbone_cls == "DynEdgeTITO":
        params = port_tito_state_dict(state_dict, template)
    elif backbone_cls == "DeepIce":
        params = port_deepice_state_dict(state_dict, template)
    elif backbone_cls == "DynEdgeJINST":
        params = port_jinst_state_dict(state_dict, template)
    elif backbone_cls == "ConvNet":
        params = port_convnet_state_dict(state_dict, template)
    elif backbone_cls == "ParticleNeT":
        params = port_particlenet_state_dict(state_dict, template)
    else:
        params = port_dynedge_state_dict(state_dict, template)
    return model, graph_definition, params


def port_tito_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference DynEdgeTITO-StandardModel state_dict onto our flax
    tree (reference layout: ``gnn/dynedge_kaggle_tito.py:152-175`` +
    DynTrans at ``components/layers.py:117-197``).

    The 3-way EdgeConvTito first linear ``cat[x_i, x_j-x_i, x_j] @
    [W1;W2;W3]^T`` linearises to ``self = (W1-W2)^T``,
    ``nbr = (W2+W3)^T`` (``models/components/layers.py:69-98``); torch's
    packed ``in_proj_weight`` maps to the combined qkv Dense transposed.
    """
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    conv_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"backbone\._conv_layers\.(\d+)\.", k))
        }
    )
    assert conv_ids, "no `backbone._conv_layers.*` keys found"
    for i in conv_ids:
        p = f"backbone._conv_layers.{i}"
        conv = root["backbone"][f"conv_{i}"]
        # EdgeConvTito MLP: nn.0 (3-way first linear), nn.2 (second)
        w = take(f"{p}.nn.0.weight")
        b = take(f"{p}.nn.0.bias")
        d_in = w.shape[1] // 3
        w1, w2, w3 = (
            w[:, :d_in],
            w[:, d_in : 2 * d_in],
            w[:, 2 * d_in :],
        )
        _fill(conv["conv"]["self_dense"], "kernel", (w1 - w2).T)
        _fill(conv["conv"]["self_dense"], "bias", b)
        _fill(conv["conv"]["nbr_dense"], "kernel", (w2 + w3).T)
        _fill(conv["conv"], "out_kernel", take(f"{p}.nn.2.weight").T)
        _fill(conv["conv"], "out_bias", take(f"{p}.nn.2.bias"))
        # post-EdgeConv LayerNorm
        _fill(conv["norm1"], "scale", take(f"{p}.norm1.weight"))
        _fill(conv["norm1"], "bias", take(f"{p}.norm1.bias"))
        # transformer encoder layer
        t = f"{p}._transformer_encoder.layers.0"
        tr = conv["transformer"]
        _fill(tr["mha"]["qkv"], "kernel", take(f"{t}.self_attn.in_proj_weight").T)
        _fill(tr["mha"]["qkv"], "bias", take(f"{t}.self_attn.in_proj_bias"))
        _fill(tr["mha"]["out"], "kernel", take(f"{t}.self_attn.out_proj.weight").T)
        _fill(tr["mha"]["out"], "bias", take(f"{t}.self_attn.out_proj.bias"))
        _fill(tr["linear1"], "kernel", take(f"{t}.linear1.weight").T)
        _fill(tr["linear1"], "bias", take(f"{t}.linear1.bias"))
        _fill(tr["linear2"], "kernel", take(f"{t}.linear2.weight").T)
        _fill(tr["linear2"], "bias", take(f"{t}.linear2.bias"))
        _fill(tr["norm1"], "scale", take(f"{t}.norm1.weight"))
        _fill(tr["norm1"], "bias", take(f"{t}.norm1.bias"))
        _fill(tr["norm2"], "scale", take(f"{t}.norm2.weight"))
        _fill(tr["norm2"], "bias", take(f"{t}.norm2.bias"))

    for torch_name, flax_name in (
        ("_post_processing", "post_processing"),
        ("_readout", "readout"),
    ):
        prefix = f"backbone.{torch_name}"
        lin_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(rf"{re.escape(prefix)}\.(\d+)\.weight$", k))
                and sd[k].ndim == 2
            }
        )
        for j, lid in enumerate(lin_ids):
            _fill(
                root["backbone"][flax_name][f"dense_{j}"],
                "kernel",
                take(f"{prefix}.{lid}.weight").T,
            )
            _fill(
                root["backbone"][flax_name][f"dense_{j}"],
                "bias",
                take(f"{prefix}.{lid}.bias"),
            )

    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def port_deepice_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference DeepIce (IceMix) StandardModel state_dict onto our
    flax tree.

    Reference layout (``gnn/icemix.py:31-167``):
    ``fourier_ext`` (``embedding.py:53-136``: sin embs + aux ``nn.Embedding``
    + Linear/LayerNorm/GELU/Linear Sequential), ``rel_pos.projection``,
    ``sandwich.{i}`` ``Block_rel`` (separate q/k/v projections with detached
    ``q_bias``/``v_bias`` Parameters, ``layers.py:431-443``), a bias-free
    ``cls_token`` Linear, ``blocks.{i}`` ``Block`` (packed
    ``nn.MultiheadAttention`` ``in_proj_weight`` + layer-scale
    ``gamma_1/gamma_2``), and optionally a nested ``dyn_edge`` DynEdge
    (``add_norm_layer=True, skip_readout=True``).

    Our ``BlockRel`` always carries q/v biases; when the torch checkpoint
    has none (``qkv_bias=False``, the DeepIce default) they are filled with
    zeros — functionally identical.
    """
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    bb = root["backbone"]

    # --- FourierEncoder --------------------------------------------------
    fe = bb["fourier_ext"]
    fp = "backbone.fourier_ext"
    if f"{fp}.sin_emb.scale" in sd:  # scaled_emb=True checkpoints
        _fill(fe["sin_emb"], "scale", take(f"{fp}.sin_emb.scale"))
        _fill(fe["sin_emb2"], "scale", take(f"{fp}.sin_emb2.scale"))
    if f"{fp}.aux_emb.weight" in sd:  # n_features >= 6
        _fill(fe["aux_emb"], "embedding", take(f"{fp}.aux_emb.weight"))
    _fill(fe["mlp_0"], "kernel", take(f"{fp}.mlp.0.weight").T)
    _fill(fe["mlp_0"], "bias", take(f"{fp}.mlp.0.bias"))
    _fill(fe["mlp_norm"], "scale", take(f"{fp}.mlp.1.weight"))
    _fill(fe["mlp_norm"], "bias", take(f"{fp}.mlp.1.bias"))
    _fill(fe["mlp_1"], "kernel", take(f"{fp}.mlp.3.weight").T)
    _fill(fe["mlp_1"], "bias", take(f"{fp}.mlp.3.bias"))

    # --- SpacetimeEncoder ------------------------------------------------
    _fill(
        bb["rel_pos"]["projection"],
        "kernel",
        take("backbone.rel_pos.projection.weight").T,
    )
    _fill(
        bb["rel_pos"]["projection"],
        "bias",
        take("backbone.rel_pos.projection.bias"),
    )

    # --- cls token (bias-free Linear weight, icemix.py:86) ---------------
    _fill(bb, "cls_token", take("backbone.cls_token.weight"))

    # --- sandwich: Block_rel layers --------------------------------------
    def norm(dst, p):
        _fill(dst, "scale", take(f"{p}.weight"))
        _fill(dst, "bias", take(f"{p}.bias"))

    def mlp(dst, p):
        _fill(dst["fc1"], "kernel", take(f"{p}.input_projection.weight").T)
        _fill(dst["fc1"], "bias", take(f"{p}.input_projection.bias"))
        _fill(dst["fc2"], "kernel", take(f"{p}.output_projection.weight").T)
        _fill(dst["fc2"], "bias", take(f"{p}.output_projection.bias"))

    sandwich_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"backbone\.sandwich\.(\d+)\.", k))
        }
    )
    assert sandwich_ids, "no `backbone.sandwich.*` keys — not a DeepIce dict?"
    for i in sandwich_ids:
        p = f"backbone.sandwich.{i}"
        blk = bb[f"sandwich_{i}"]
        norm(blk["norm1"], f"{p}.norm1")
        norm(blk["norm2"], f"{p}.norm2")
        attn = blk["attn"]
        D = sd[f"{p}.attn.proj_q.weight"].shape[0]
        _fill(attn["proj_q"], "kernel", take(f"{p}.attn.proj_q.weight").T)
        _fill(attn["proj_k"], "kernel", take(f"{p}.attn.proj_k.weight").T)
        _fill(attn["proj_v"], "kernel", take(f"{p}.attn.proj_v.weight").T)
        qb = (
            take(f"{p}.attn.q_bias")
            if f"{p}.attn.q_bias" in sd
            else np.zeros(D, np.float32)
        )
        vb = (
            take(f"{p}.attn.v_bias")
            if f"{p}.attn.v_bias" in sd
            else np.zeros(D, np.float32)
        )
        _fill(attn["proj_q"], "bias", qb)
        _fill(attn["proj_v"], "bias", vb)
        _fill(attn["proj"], "kernel", take(f"{p}.attn.proj.weight").T)
        _fill(attn["proj"], "bias", take(f"{p}.attn.proj.bias"))
        mlp(blk["mlp"], f"{p}.mlp")

    # --- blocks: standard Blocks with layer-scale ------------------------
    block_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"backbone\.blocks\.(\d+)\.", k))
        }
    )
    for i in block_ids:
        p = f"backbone.blocks.{i}"
        blk = bb[f"blocks_{i}"]
        norm(blk["norm1"], f"{p}.norm1")
        norm(blk["norm2"], f"{p}.norm2")
        # packed torch in_proj rows [q; k; v] -> our combined qkv Dense
        # columns (kernel = in_proj_weight^T, split on the last axis)
        _fill(
            blk["attn"]["qkv"],
            "kernel",
            take(f"{p}.attn.in_proj_weight").T,
        )
        _fill(blk["attn"]["qkv"], "bias", take(f"{p}.attn.in_proj_bias"))
        _fill(
            blk["attn"]["out"],
            "kernel",
            take(f"{p}.attn.out_proj.weight").T,
        )
        _fill(blk["attn"]["out"], "bias", take(f"{p}.attn.out_proj.bias"))
        mlp(blk["mlp"], f"{p}.mlp")
        _fill(blk, "gamma_1", take(f"{p}.gamma_1"))
        _fill(blk, "gamma_2", take(f"{p}.gamma_2"))

    # --- optional nested DynEdge (include_dynedge=True) ------------------
    if any(k.startswith("backbone.dyn_edge.") for k in sd):
        _port_dynedge_backbone(
            sd, take, "backbone.dyn_edge", bb["dyn_edge"]
        )

    # --- task heads ------------------------------------------------------
    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def port_iseecube_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference ISeeCube state_dict onto our flax tree.

    Reference layout (``transformer/iseecube.py:20-102`` + torchscale's
    Magneto encoder, transcribed in ``tests/refshim/_torchscale.py``):
    ``fourier_ext`` (same structure as DeepIce's), ``pos_embedding`` /
    ``class_token`` / ``register_tokens`` Parameters,
    ``encoder.layers.{i}`` with separate ``{q,k,v}_proj`` Linears,
    Magneto ``inner_attn_ln`` / ``ffn.ffn_layernorm`` sub-norms, the
    shared T5 bucket table
    ``encoder.relative_position.relative_attention_bias``, torchscale's
    final ``encoder.layer_norm``, and ISeeCube's own ``layer_norm``.
    """
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    bb = root["backbone"]

    # --- FourierEncoder (identical layout to DeepIce's) ------------------
    fe = bb["fourier_ext"]
    fp = "backbone.fourier_ext"
    if f"{fp}.sin_emb.scale" in sd:  # scaled_emb=True checkpoints
        _fill(fe["sin_emb"], "scale", take(f"{fp}.sin_emb.scale"))
        _fill(fe["sin_emb2"], "scale", take(f"{fp}.sin_emb2.scale"))
    if f"{fp}.aux_emb.weight" in sd:  # n_features >= 6
        _fill(fe["aux_emb"], "embedding", take(f"{fp}.aux_emb.weight"))
    _fill(fe["mlp_0"], "kernel", take(f"{fp}.mlp.0.weight").T)
    _fill(fe["mlp_0"], "bias", take(f"{fp}.mlp.0.bias"))
    _fill(fe["mlp_norm"], "scale", take(f"{fp}.mlp.1.weight"))
    _fill(fe["mlp_norm"], "bias", take(f"{fp}.mlp.1.bias"))
    _fill(fe["mlp_1"], "kernel", take(f"{fp}.mlp.3.weight").T)
    _fill(fe["mlp_1"], "bias", take(f"{fp}.mlp.3.bias"))

    # --- special tokens ---------------------------------------------------
    _fill(bb, "pos_embedding", take("backbone.pos_embedding"))
    _fill(bb, "class_token", take("backbone.class_token"))
    _fill(bb, "register_tokens", take("backbone.register_tokens"))

    # --- shared relative-position bucket table ----------------------------
    _fill(
        bb["rel_pos_bias"],
        "rel_embedding",
        take(
            "backbone.encoder.relative_position."
            "relative_attention_bias.weight"
        ),
    )

    def norm(dst, p):
        _fill(dst, "scale", take(f"{p}.weight"))
        _fill(dst, "bias", take(f"{p}.bias"))

    def linear(dst, p):
        _fill(dst, "kernel", take(f"{p}.weight").T)
        _fill(dst, "bias", take(f"{p}.bias"))

    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"backbone\.encoder\.layers\.(\d+)\.", k))
        }
    )
    assert layer_ids, (
        "no `backbone.encoder.layers.*` keys — not an ISeeCube dict?"
    )
    for i in layer_ids:
        p = f"backbone.encoder.layers.{i}"
        attn = bb[f"attn_{i}"]
        linear(attn["proj_q"], f"{p}.self_attn.q_proj")
        linear(attn["proj_k"], f"{p}.self_attn.k_proj")
        linear(attn["proj_v"], f"{p}.self_attn.v_proj")
        norm(attn["inner_attn_ln"], f"{p}.self_attn.inner_attn_ln")
        linear(attn["out"], f"{p}.self_attn.out_proj")
        norm(bb[f"norm1_{i}"], f"{p}.self_attn_layer_norm")
        norm(bb[f"norm2_{i}"], f"{p}.final_layer_norm")
        linear(bb[f"fc1_{i}"], f"{p}.ffn.fc1")
        norm(bb[f"ffn_ln_{i}"], f"{p}.ffn.ffn_layernorm")
        linear(bb[f"fc2_{i}"], f"{p}.ffn.fc2")

    # --- the two consecutive final LayerNorms ------------------------------
    norm(bb["encoder_layer_norm"], "backbone.encoder.layer_norm")
    norm(bb["layer_norm"], "backbone.layer_norm")

    # --- task heads ------------------------------------------------------
    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params


def _port_torch_gru(sd, take, prefix, rnn_node, num_layers) -> None:
    """Map a torch ``nn.GRU`` (``weight_ih_l{l}`` [3H, in] with gate rows
    [r; z; n], reference ``rnn/node_rnn.py:66-73``) onto our stacked
    ``_ResettingGRULayer`` flax cells (``models/rnn/node_rnn.py``).

    Gate algebra is identical between torch GRU and flax GRUCell — torch
    folds two bias vectors per gate (``b_ih + b_hh``) where flax has one
    on the input Dense (r, z) and keeps ``b_hn`` on the hidden Dense for
    the n gate (both apply the reset gate INSIDE the hidden branch:
    ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``).
    """
    for layer in range(num_layers):
        w_ih = take(f"{prefix}.weight_ih_l{layer}")  # [3H, in]
        w_hh = take(f"{prefix}.weight_hh_l{layer}")  # [3H, H]
        b_ih = take(f"{prefix}.bias_ih_l{layer}")  # [3H]
        b_hh = take(f"{prefix}.bias_hh_l{layer}")  # [3H]
        H = w_hh.shape[1]
        gru = rnn_node[f"gru_{layer}"]["cell"]["gru"]
        for gi, gate in enumerate(("r", "z", "n")):
            wi = w_ih[gi * H : (gi + 1) * H]
            wh = w_hh[gi * H : (gi + 1) * H]
            bi = b_ih[gi * H : (gi + 1) * H]
            bh = b_hh[gi * H : (gi + 1) * H]
            _fill(gru[f"i{gate}" if gate != "n" else "in"], "kernel", wi.T)
            _fill(gru[f"h{gate}" if gate != "n" else "hn"], "kernel", wh.T)
            if gate == "n":
                _fill(gru["in"], "bias", bi)
                _fill(gru["hn"], "bias", bh)
            else:
                _fill(gru[f"i{gate}"], "bias", bi + bh)


def port_rnn_tito_state_dict(
    state_dict: Dict[str, Any],
    template: Dict[str, Any],
) -> Dict[str, Any]:
    """Map a reference RNN_TITO-StandardModel state_dict onto our flax
    tree (reference ``gnn/RNN_tito.py:100-125``: ``_rnn`` Node_RNN with a
    torch ``nn.GRU`` + ``_dynedge_tito`` DynEdgeTITO)."""
    sd = _normalise_keys(state_dict)
    params = _copy_tree(template)
    root = params["params"] if "params" in params else params
    used: set = set()

    def take(key):
        used.add(key)
        return sd[key]

    bb = root["backbone"]

    num_layers = len(
        {
            k
            for k in sd
            if re.match(r"backbone\._rnn\._rnn\.weight_ih_l\d+$", k)
        }
    )
    assert num_layers, "no `backbone._rnn._rnn.weight_ih_l*` keys found"
    _port_torch_gru(
        sd, take, "backbone._rnn._rnn", bb["rnn"], num_layers
    )

    # delegate the DynEdgeTITO half to its porter on a re-rooted view
    tito_sd = {
        "backbone." + k[len("backbone._dynedge_tito.") :]: v
        for k, v in sd.items()
        if k.startswith("backbone._dynedge_tito.")
    }
    tito_params = port_tito_state_dict(
        tito_sd,
        {"params": {"backbone": bb["dynedge_tito"]}},
    )
    root["backbone"]["dynedge_tito"] = tito_params["params"]["backbone"]
    used.update(
        "backbone._dynedge_tito." + k[len("backbone.") :] for k in tito_sd
    )

    _port_tasks(sd, take, root)
    _check_unused(sd, used)
    return params
