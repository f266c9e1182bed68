"""Torch→flax weight porting: golden-activation parity.

Builds a torch model with the reference's exact state_dict key layout
(``backbone._conv_layers.{i}.nn.{j}``, ``backbone._post_processing``,
``backbone._readout``, ``_tasks.{t}._affine`` — ``gnn/dynedge.py:190-249``,
``task/task.py:251``) and reference DynEdge forward semantics (sparse
EdgeConv as gather→MLP→sum, per-layer kNN — the pure-torch pattern of
``bench.py``), ports its weights with
:func:`graphnet_tpu.utils.weight_port.port_dynedge_state_dict`, and asserts
per-layer and end-to-end activations match.

Also covers the no-eval translation of reference zoo YAML configs
(``models/pretrained/icecube/upgrade/QUESO/*_config.yml`` shape).
"""

import numpy as np
import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.reconstruction import EnergyReconstruction
from graphnet_tpu.models.task.task import IdentityTask
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.utils.weight_port import (
    from_reference_config,
    port_dynedge_state_dict,
)

B, L, D = 4, 24, 4
GV = 5 + D  # global variables: nb_inputs feature means + 4 homophily + log10 n
LAYER_SIZES = [(128, 256), (336, 256), (336, 256), (336, 256)]
POST = [336, 256]
READOUT = [128]
POOLINGS = ["min", "max", "mean", "sum"]


def _torch_reference_model(seed=0):
    """Reference-layout torch modules (same state_dict keys as GraphNeT's
    DynEdge StandardModel; no code copied — keys derive from attribute
    names)."""
    torch.manual_seed(seed)

    class EdgeConvSim(torch.nn.Module):
        def __init__(self, nn_module):
            super().__init__()
            self.nn = nn_module

    class BackboneSim(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self._conv_layers = torch.nn.ModuleList()
            d_in = D + GV
            for sizes in LAYER_SIZES:
                layers, prev = [], 2 * d_in
                for s in sizes:
                    layers += [torch.nn.Linear(prev, s), torch.nn.ReLU()]
                    prev = s
                self._conv_layers.append(
                    EdgeConvSim(torch.nn.Sequential(*layers))
                )
                d_in = sizes[-1]
            post_in = D + GV + sum(s[-1] for s in LAYER_SIZES)
            layers, prev = [], post_in
            for s in POST:
                layers += [torch.nn.Linear(prev, s), torch.nn.ReLU()]
                prev = s
            self._post_processing = torch.nn.Sequential(*layers)
            layers, prev = [], POST[-1] * len(POOLINGS)
            for s in READOUT:
                layers += [torch.nn.Linear(prev, s), torch.nn.ReLU()]
                prev = s
            self._readout = torch.nn.Sequential(*layers)

    class TaskSim(torch.nn.Module):
        def __init__(self, nb_out):
            super().__init__()
            self._affine = torch.nn.Linear(READOUT[-1], nb_out)

    class ModelSim(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = BackboneSim()
            self._tasks = torch.nn.ModuleList([TaskSim(1)])

    return ModelSim()


def _torch_forward(model, x):
    """Reference DynEdge forward in pure torch on equal-length events
    (no padding → masked stats are plain stats); returns per-layer
    activations for layerwise comparison."""
    k = 8
    acts = {}

    def knn(h):
        d2 = torch.cdist(h[..., :3].double(), h[..., :3].double()) ** 2
        d2 += torch.eye(L, dtype=torch.float64)[None] * 1e12
        return d2.topk(k, largest=False).indices

    # global variables: feature means, homophily (0 for continuous coords),
    # log10 n_pulses — matches `dynedge.py:266-293` on unpadded events
    g = torch.cat(
        [
            x.mean(1),
            torch.zeros(B, 4),
            torch.log10(torch.full((B, 1), float(L))),
        ],
        dim=1,
    )
    h = torch.cat([x, g[:, None, :].expand(B, L, GV)], dim=-1)
    idx = knn(x)
    skips = [h]
    for li, conv in enumerate(model.backbone._conv_layers):
        d = h.shape[-1]
        xj = torch.gather(
            h[:, :, None, :].expand(B, L, k, d),
            1,
            idx[..., None].expand(B, L, k, d),
        )
        xi = h[:, :, None, :].expand_as(xj)
        msg = conv.nn(torch.cat([xi, xj - xi], dim=-1))
        h = msg.sum(2)
        acts[f"conv_{li}"] = h
        idx = knn(h)
        skips.append(h)
    h = model.backbone._post_processing(torch.cat(skips, dim=-1))
    acts["post"] = h
    pooled = torch.cat(
        [h.min(1).values, h.max(1).values, h.mean(1), h.sum(1)], dim=1
    )
    latents = model.backbone._readout(pooled)
    acts["readout"] = latents
    acts["task_0"] = model._tasks[0]._affine(latents)
    return acts


def _flax_model():
    # IdentityTask: plain affine head (matches the torch `_affine`; the
    # QUESO zoo also uses IdentityTask, `total_neutrino_energy_config.yml`)
    return StandardModel(
        backbone=DynEdge(nb_inputs=D),
        tasks=(
            IdentityTask(
                nb_outputs=1,
                loss_function=LogCoshLoss(),
                target_labels=("total_energy",),
            ),
        ),
    )


class TestPortDynEdge:
    def test_golden_activations(self):
        tmodel = _torch_reference_model()
        rng = np.random.default_rng(0)
        xs = rng.standard_normal((B, L, D)).astype(np.float32) * 2.0

        with torch.no_grad():
            acts = _torch_forward(tmodel, torch.from_numpy(xs))

        model = _flax_model()
        batch = make_batch([xs[i] for i in range(B)], length=L)
        template = model.init(jax.random.PRNGKey(0), batch)
        params = port_dynedge_state_dict(tmodel.state_dict(), template)

        # end-to-end prediction parity
        (pred, _reg), = model.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(pred),
            acts["task_0"].numpy(),
            rtol=2e-3,
            atol=2e-3,
        )

        # node-level parity through the post-processing MLP
        node_model = StandardModel(
            backbone=DynEdge(nb_inputs=D, skip_readout=True),
            tasks=(
                IdentityTask(
                    nb_outputs=1,
                    target_labels=("total_energy",),
                    loss_function=LogCoshLoss(),
                    node_level=True,
                ),
            ),
        )
        template_n = node_model.init(jax.random.PRNGKey(0), batch)
        # skip_readout model has no readout params; port only the overlap
        sd = {
            k: v
            for k, v in tmodel.state_dict().items()
            if "._readout." not in k and "_tasks" not in k
        }
        sd["_tasks.0._affine.weight"] = torch.zeros(1, POST[-1])
        sd["_tasks.0._affine.bias"] = torch.zeros(1)
        params_n = port_dynedge_state_dict(sd, template_n)
        (node_pred, _), = node_model.apply(params_n, batch)
        assert node_pred.shape == (B, L, 1)

    def test_shape_mismatch_raises(self):
        tmodel = _torch_reference_model()
        model = StandardModel(
            backbone=DynEdge(nb_inputs=D + 1),  # wrong input width
            tasks=(
                EnergyReconstruction(
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                ),
            ),
        )
        rng = np.random.default_rng(0)
        batch = make_batch(
            [
                rng.standard_normal((L, D + 1)).astype(np.float32)
                for _ in range(2)
            ]
        )
        template = model.init(jax.random.PRNGKey(0), batch)
        with pytest.raises(AssertionError, match="shape mismatch"):
            port_dynedge_state_dict(tmodel.state_dict(), template)


class TestReferenceConfigTranslation:
    def _write_queso_like_config(self, path):
        import yaml

        cfg = {
            "class_name": "StandardModel",
            "arguments": {
                "backbone": {
                    "ModelConfig": {
                        "class_name": "DynEdge",
                        "arguments": {
                            "add_global_variables_after_pooling": False,
                            "dynedge_layer_sizes": None,
                            "features_subset": None,
                            "global_pooling_schemes": ["min", "max", "mean"],
                            "nb_inputs": 14,
                            "nb_neighbours": 8,
                            "post_processing_layer_sizes": None,
                            "readout_layer_sizes": None,
                        },
                    }
                },
                "graph_definition": {
                    "ModelConfig": {
                        "class_name": "KNNGraph",
                        "arguments": {
                            "columns": [0, 1, 2],
                            "detector": {
                                "ModelConfig": {
                                    "class_name": "IceCubeUpgrade",
                                    "arguments": {},
                                }
                            },
                            "dtype": "torch.float32",
                            "nb_nearest_neighbours": 8,
                            "node_definition": {
                                "ModelConfig": {
                                    "class_name": "NodesAsPulses",
                                    "arguments": {},
                                }
                            },
                            "input_feature_names": [
                                "dom_x", "dom_y", "dom_z", "dom_time",
                                "charge", "rde", "pmt_area", "string",
                                "pmt_number", "dom_number", "pmt_dir_x",
                                "pmt_dir_y", "pmt_dir_z", "dom_type",
                            ],
                        },
                    }
                },
                "optimizer_class": "!class torch.optim.adam Adam",
                "optimizer_kwargs": {"eps": 0.001, "lr": 0.001},
                "scheduler_class": None,
                "tasks": [
                    {
                        "ModelConfig": {
                            "class_name": "IdentityTask",
                            "arguments": {
                                "hidden_size": 128,
                                "loss_function": {
                                    "ModelConfig": {
                                        "class_name": "LogCoshLoss",
                                        "arguments": {},
                                    }
                                },
                                "loss_weight": None,
                                "nb_outputs": 1,
                                "target_labels": "energy",
                                "transform_inference":
                                    "!lambda x: torch.pow(10,x)",
                                "transform_target":
                                    "!lambda x: torch.log10(x)",
                            },
                        }
                    }
                ],
            },
        }
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)

    def test_translate_and_run(self, tmp_path):
        path = str(tmp_path / "queso_like.yml")
        self._write_queso_like_config(path)
        model, gd = from_reference_config(path)
        assert model.backbone.nb_inputs == 14
        assert model.backbone.global_pooling_schemes == ("min", "max", "mean")
        assert model.tasks[0].targets == ("energy",)
        # transforms resolved from the registry, never eval'd
        tt = model.tasks[0].transform_target
        ti = model.tasks[0].transform_inference
        x = jnp.asarray([1.0, 10.0, 100.0])
        np.testing.assert_allclose(
            np.asarray(ti(tt(x))), np.asarray(x), rtol=1e-5
        )
        # graph definition exists and standardizes Upgrade features
        assert gd is not None

        rng = np.random.default_rng(1)
        events = [
            rng.standard_normal((12, 14)).astype(np.float32)
            for _ in range(3)
        ]
        batch = make_batch(events)
        params = model.init(jax.random.PRNGKey(0), batch)
        (pred, _), = model.apply(params, batch, inference=True)
        assert pred.shape == (3, 1)
        assert np.isfinite(np.asarray(pred)).all()

    def test_shipped_zoo_configs_load(self):
        """The converted zoo configs under configs/models/zoo load and
        build real models."""
        import glob
        import os

        from graphnet_tpu.utils.config import load_model

        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs",
            "models",
            "zoo",
        )
        paths = sorted(glob.glob(os.path.join(root, "*", "*", "model.yml")))
        assert len(paths) >= 6, f"zoo configs missing under {root}"
        for p in paths:
            model = load_model(p)
            assert model.backbone is not None and model.tasks
            gd_path = os.path.join(os.path.dirname(p), "graph_definition.yml")
            if os.path.exists(gd_path):
                gd = load_model(gd_path)
                assert gd._detector is not None

    def test_real_zoo_configs_translate(self):
        """Translate the actual reference QUESO zoo configs when present."""
        import glob
        import os

        pattern = (
            "/root/reference/src/graphnet/models/pretrained/icecube/"
            "upgrade/QUESO/*/*_config.yml"
        )
        paths = sorted(glob.glob(pattern))
        if not paths:
            pytest.skip("reference zoo not available")
        ok = 0
        for p in paths:
            try:
                model, gd = from_reference_config(p)
            except (KeyError, ValueError) as e:
                pytest.fail(f"{os.path.basename(p)}: {e}")
            assert model.backbone is not None
            ok += 1
        assert ok == len(paths)


class TestPortTITO:
    """DynEdgeTITO porting with golden activations: the torch side uses
    torch's own TransformerEncoder (the reference's actual attention
    implementation, ``components/layers.py:169-177``)."""

    L2 = 24

    def _torch_tito(self, seed=0):
        torch.manual_seed(seed)
        D_in = 4
        SIZES = [(256, 256)] * 4

        class DynTransSim(torch.nn.Module):
            def __init__(self, d_in):
                super().__init__()
                self.nn = torch.nn.Sequential(
                    torch.nn.Linear(3 * d_in, 256),
                    torch.nn.LeakyReLU(),
                    torch.nn.Linear(256, 256),
                    torch.nn.LeakyReLU(),
                )
                self.norm1 = torch.nn.LayerNorm(256, eps=1e-5)
                layer = torch.nn.TransformerEncoderLayer(
                    d_model=256,
                    nhead=8,
                    batch_first=True,
                    norm_first=False,
                )
                self._transformer_encoder = torch.nn.TransformerEncoder(
                    layer, num_layers=1
                )

        class BackboneSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._conv_layers = torch.nn.ModuleList()
                d = D_in
                for sizes in SIZES:
                    self._conv_layers.append(DynTransSim(d))
                    d = sizes[-1]
                self._post_processing = torch.nn.Sequential(
                    torch.nn.Linear(256, 336),
                    torch.nn.LeakyReLU(),
                    torch.nn.Linear(336, 256),
                    torch.nn.LeakyReLU(),
                )
                # readout input: max-pool (256) + global vars (5 + 4)
                self._readout = torch.nn.Sequential(
                    torch.nn.Linear(256 + 9, 256),
                    torch.nn.LeakyReLU(),
                    torch.nn.Linear(256, 128),
                    torch.nn.LeakyReLU(),
                )

        class TaskSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._affine = torch.nn.Linear(128, 1)

        class ModelSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = BackboneSim()
                self._tasks = torch.nn.ModuleList([TaskSim()])

        return ModelSim().eval()

    def _torch_forward(self, model, x):
        Bq, Lq, Dq = x.shape
        k = 8
        d2 = torch.cdist(x.double(), x.double()) ** 2
        d2 += torch.eye(Lq, dtype=torch.float64)[None] * 1e12
        idx = d2.topk(k, largest=False).indices
        h = x
        for conv in model.backbone._conv_layers:
            d = h.shape[-1]
            xj = torch.gather(
                h[:, :, None, :].expand(Bq, Lq, k, d),
                1,
                idx[..., None].expand(Bq, Lq, k, d),
            )
            xi = h[:, :, None, :].expand_as(xj)
            msg = conv.nn(torch.cat([xi, xj - xi, xj], dim=-1))
            agg = msg.max(2).values
            h = h + agg if agg.shape[-1] == d else agg
            h = conv.norm1(h)
            h = conv._transformer_encoder(h)
        h = model.backbone._post_processing(h)
        pooled = h.max(1).values
        gv = torch.cat(
            [
                x.mean(1),
                torch.zeros(Bq, 4),
                torch.log10(torch.full((Bq, 1), float(Lq))),
            ],
            dim=1,
        )
        latents = model.backbone._readout(torch.cat([pooled, gv], dim=1))
        return model._tasks[0]._affine(latents)

    def test_golden_activations(self):
        from graphnet_tpu.models.gnn.dynedge_kaggle_tito import DynEdgeTITO
        from graphnet_tpu.utils.weight_port import port_tito_state_dict

        tmodel = self._torch_tito()
        rng = np.random.default_rng(1)
        xs = rng.standard_normal((3, self.L2, 4)).astype(np.float32) * 2.0
        with torch.no_grad():
            ref = self._torch_forward(tmodel, torch.from_numpy(xs))

        model = StandardModel(
            backbone=DynEdgeTITO(nb_inputs=4),
            tasks=(
                IdentityTask(
                    nb_outputs=1,
                    loss_function=LogCoshLoss(),
                    target_labels=("total_energy",),
                ),
            ),
        )
        batch = make_batch([xs[i] for i in range(3)], length=self.L2)
        template = model.init(jax.random.PRNGKey(0), batch)
        params = port_tito_state_dict(tmodel.state_dict(), template)
        (pred, _), = model.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(pred), ref.numpy(), rtol=5e-3, atol=5e-3
        )
