"""Pretrained-zoo deployment regression (reference
``tests/deployment/queso_test.py:1-228``): EVERY reference zoo config —
6 QUESO (upgrade) + 5 IceMix (kaggle) — is translated, loaded with a
reference-layout state_dict taken from the EXECUTED reference backbone
(via ``tests/refshim``), saved through our config system, and served
through the full :class:`DeploymentModule` path on events built from the
bundled database's real pulse geometry.  Asserts output schema,
determinism across calls, and (for the pulse cleaner) ragged node-level
output shapes.
"""

import glob
import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import refshim

if not refshim.reference_available():  # pragma: no cover
    pytest.skip("no reference checkout", allow_module_level=True)

import yaml

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA

QUESO_GLOB = (
    "/root/reference/src/graphnet/models/pretrained/icecube/"
    "upgrade/QUESO/*/*_config.yml"
)
ICEMIX_GLOB = (
    "/root/reference/src/graphnet/models/pretrained/icecube/"
    "kaggle/icemix/neutrino_direction/*/*.yml"
)

N_EVENTS = 6


def _bundled_pulse_geometry(n_events: int):
    """Real xyz+t pulse arrays from the bundled Prometheus DB — the zoo
    detectors are IceCube, so only the geometry is reused; remaining
    feature columns are synthesised by name."""
    import sqlite3

    if not os.path.exists(EXAMPLE_SQLITE_DATA):
        pytest.skip("example data not present")
    conn = sqlite3.connect(EXAMPLE_SQLITE_DATA)
    rows = conn.execute(
        "SELECT event_no, sensor_pos_x, sensor_pos_y, sensor_pos_z, t "
        "FROM total ORDER BY event_no"
    ).fetchall()
    conn.close()
    arr = np.asarray(rows, np.float64)
    out = []
    for e in np.unique(arr[:, 0])[:n_events]:
        out.append(arr[arr[:, 0] == e, 1:])
    return out


# feature-name -> synthesiser for the non-geometry columns of the zoo
# detectors (IceCubeUpgrade / IceCubeKaggle feature maps,
# models/detector/icecube.py)
def _fill_column(name: str, xyzt: np.ndarray, rng) -> np.ndarray:
    n = len(xyzt)
    if name in ("dom_x", "x"):
        return xyzt[:, 0]
    if name in ("dom_y", "y"):
        return xyzt[:, 1]
    if name in ("dom_z", "z"):
        return xyzt[:, 2]
    if name in ("dom_time", "time"):
        return np.abs(xyzt[:, 3]) * 1e3 + 1e4
    if name == "charge":
        return rng.gamma(2.0, 1.0, n) + 0.1
    if name == "rde":
        return np.full(n, 1.0)
    if name == "pmt_area":
        return np.full(n, 0.05)
    if name == "string":
        return rng.integers(1, 90, n).astype(np.float64)
    if name == "pmt_number":
        return rng.integers(0, 20, n).astype(np.float64)
    if name == "dom_number":
        return rng.integers(1, 60, n).astype(np.float64)
    if name.startswith("pmt_dir"):
        return rng.normal(0, 0.5, n)
    if name == "dom_type":
        return rng.choice([20.0, 110.0, 130.0], n)
    if name in ("hlc", "auxiliary"):
        return rng.integers(0, 2, n).astype(np.float64)
    raise KeyError(f"no synthesiser for zoo feature {name!r}")


def _events_for(gd, n_events: int, seed: int = 0):
    """Build Events through the translated GraphDefinition from bundled
    geometry + synthesised columns."""
    rng = np.random.default_rng(seed)
    names = list(gd._input_feature_names)
    events = []
    for xyzt in _bundled_pulse_geometry(n_events):
        cols = [_fill_column(nm, xyzt, rng) for nm in names]
        feats = np.stack(cols, axis=1)
        events.append(gd(feats, names))
    return events


def _reference_state_dict(cfg_path: str, model):
    """State_dict with the reference's exact key layout: the executed
    reference backbone's own state_dict (prefixed ``backbone.``) plus
    synthesised task affine heads."""
    refshim.load_reference()
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    bb_cfg = cfg["arguments"]["backbone"]["ModelConfig"]
    name = bb_cfg["class_name"]
    args = dict(bb_cfg["arguments"])

    # YAML stores tuples as lists; the reference DynEdge asserts tuples
    for a in (args, args.get("dynedge_args") or {}):
        if isinstance(a.get("dynedge_layer_sizes"), list):
            a["dynedge_layer_sizes"] = [
                tuple(s) for s in a["dynedge_layer_sizes"]
            ]

    torch.manual_seed(0)
    if name == "DynEdge":
        from graphnet.models.gnn.dynedge import DynEdge as RefCls
    elif name == "DeepIce":
        from graphnet.models.gnn.icemix import DeepIce as RefCls
    else:  # pragma: no cover
        raise AssertionError(f"unexpected zoo backbone {name}")
    ref_bb = RefCls(**args)
    sd = {
        f"backbone.{k}": v.detach().numpy()
        for k, v in ref_bb.state_dict().items()
    }
    latent = int(ref_bb.nb_outputs)
    rng = np.random.default_rng(1)
    for t, task in enumerate(model.tasks):
        sd[f"_tasks.{t}._affine.weight"] = (
            rng.standard_normal((task.nb_inputs, latent)).astype(
                np.float32
            )
            * 0.05
        )
        sd[f"_tasks.{t}._affine.bias"] = (
            rng.standard_normal((task.nb_inputs,)).astype(np.float32)
            * 0.05
        )
    return sd


def _deploy(cfg_path, tmp_path, tag):
    """reference config -> ported DeploymentModule + translated gd."""
    from graphnet_tpu.deployment.deployment_module import (
        DeploymentModule,
    )
    from graphnet_tpu.utils.config import save_model_config
    from graphnet_tpu.utils.weight_port import (
        from_reference_config,
        port_reference_model,
    )

    model, gd = from_reference_config(cfg_path)
    assert gd is not None, tag
    sd = _reference_state_dict(cfg_path, model)
    sd_path = str(tmp_path / f"{tag}_ref_sd.pkl")
    with open(sd_path, "wb") as f:
        pickle.dump(sd, f)
    ported_model, _, params = port_reference_model(cfg_path, sd_path)

    cfg_out = str(tmp_path / f"{tag}_model.yml")
    params_out = str(tmp_path / f"{tag}_params.pkl")
    save_model_config(ported_model, cfg_out)
    with open(params_out, "wb") as f:
        pickle.dump(params, f)
    return DeploymentModule(cfg_out, params_out), gd, ported_model


def _queso_paths():
    return sorted(glob.glob(QUESO_GLOB))


def _icemix_paths():
    return sorted(glob.glob(ICEMIX_GLOB))


@pytest.mark.slow
@pytest.mark.parametrize(
    "cfg_path",
    _queso_paths(),
    ids=[os.path.basename(os.path.dirname(p)) for p in _queso_paths()],
)
def test_queso_zoo_deployment(cfg_path, tmp_path):
    name = os.path.basename(os.path.dirname(cfg_path))
    dm, gd, model = _deploy(cfg_path, tmp_path, name)
    events = _events_for(gd, N_EVENTS)
    preds = dm(events)
    node_level = any(
        getattr(t, "node_level", False) for t in model.tasks
    )
    ncols = len(dm.prediction_columns)
    assert ncols == len(model.prediction_labels)
    if node_level:
        # the pulse cleaner: ragged per-pulse outputs (reference
        # deployment/icecube/cleaning_module.py:34-79)
        assert isinstance(preds, list) and len(preds) == len(events)
        for e, p in zip(events, preds):
            assert p.shape == (e.n_pulses, ncols), name
            assert np.isfinite(p).all(), name
    else:
        assert preds.shape == (len(events), ncols), name
        assert np.isfinite(preds).all(), name
    # determinism across calls (fresh collate + padding path)
    again = dm(events)
    if node_level:
        for p, q in zip(preds, again):
            np.testing.assert_array_equal(p, q)
    else:
        np.testing.assert_array_equal(preds, again)


@pytest.mark.slow
@pytest.mark.parametrize(
    "cfg_path",
    _icemix_paths(),
    ids=[
        os.path.basename(os.path.dirname(p)) for p in _icemix_paths()
    ],
)
def test_icemix_zoo_deployment(cfg_path, tmp_path):
    name = os.path.basename(os.path.dirname(cfg_path))
    dm, gd, model = _deploy(cfg_path, tmp_path, name)
    events = _events_for(gd, N_EVENTS)
    preds = dm(events)
    ncols = len(dm.prediction_columns)
    assert preds.shape == (len(events), ncols), name
    assert np.isfinite(preds).all(), name
    again = dm(events)
    np.testing.assert_array_equal(preds, again)
