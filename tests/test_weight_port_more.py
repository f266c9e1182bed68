"""Torch→flax weight porting for the remaining GNN backbones:
DynEdgeJINST, ConvNet, ParticleNeT.

Same golden-activation methodology as ``test_weight_port.py``: build a
torch model with the reference's exact state_dict key layout
(``gnn/dynedge_jinst.py:50-103``, ``gnn/convnet.py:44-63``,
``gnn/particlenet.py:176-222``) and reference forward semantics in pure
torch (no PyG), port the weights, assert end-to-end activations match.
BatchNorm-bearing models are compared in torch eval mode against our
``frozen_batchnorm=True`` variants (running statistics ported).
"""

import numpy as np
import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.task import IdentityTask
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.utils.weight_port import (
    port_convnet_state_dict,
    port_jinst_state_dict,
    port_particlenet_state_dict,
)

B, L, D, K = 3, 24, 4, 8


def _knn(h):
    """Brute-force kNN on the first 3 feature columns (float64 distances:
    rules out tie-flips between the torch and jax implementations)."""
    d2 = torch.cdist(h[..., :3].double(), h[..., :3].double()) ** 2
    d2 += torch.eye(h.shape[1], dtype=torch.float64)[None] * 1e12
    return d2.topk(K, largest=False).indices


def _gather(h, idx):
    Bq, Lq, d = h.shape
    return torch.gather(
        h[:, :, None, :].expand(Bq, Lq, K, d),
        1,
        idx[..., None].expand(Bq, Lq, K, d),
    )


def _task(nb_in):
    return IdentityTask(
        nb_outputs=1,
        loss_function=LogCoshLoss(),
        target_labels=("total_energy",),
    )


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, L, D)).astype(np.float32) * 2.0


class TestPortJINST:
    """layer_size_scale=1: l2=32, l3=64, l4=84, l5=64, l6=32."""

    C = 1

    def _torch_model(self, seed=0):
        torch.manual_seed(seed)
        c = self.C
        l1, l2, l3, l4, l5, l6 = D, c * 32, c * 64, c * 84, c * 64, c * 32

        class ConvSim(torch.nn.Module):
            def __init__(self, d_in, h1, h2):
                super().__init__()
                self.nn = torch.nn.Sequential(
                    torch.nn.Linear(d_in * 2, h1),
                    torch.nn.LeakyReLU(),
                    torch.nn.Linear(h1, h2),
                    torch.nn.LeakyReLU(),
                )

        class BackboneSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_add1 = ConvSim(l1, l2, l3)
                self.conv_add2 = ConvSim(l3, l4, l3)
                self.conv_add3 = ConvSim(l3, l4, l3)
                self.conv_add4 = ConvSim(l3, l4, l3)
                self.nn1 = torch.nn.Linear(l3 * 4 + l1, l4)
                self.nn2 = torch.nn.Linear(l4, l5)
                self.nn3 = torch.nn.Linear(4 * l5 + 5, l6)

        class TaskSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._affine = torch.nn.Linear(l6, 1)

        class ModelSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = BackboneSim()
                self._tasks = torch.nn.ModuleList([TaskSim()])

        return ModelSim()

    def _torch_forward(self, model, x):
        # reference forward `dynedge_jinst.py:105-152`; homophily of
        # continuous features is exactly 0
        idx = _knn(x)
        h, skips = x, [x]
        for conv in (
            model.backbone.conv_add1,
            model.backbone.conv_add2,
            model.backbone.conv_add3,
            model.backbone.conv_add4,
        ):
            xj = _gather(h, idx)
            xi = h[:, :, None, :].expand_as(xj)
            h = conv.nn(torch.cat([xi, xj - xi], dim=-1)).sum(2)
            idx = _knn(h)
            skips.append(h)
        z = torch.cat(skips, dim=-1)
        z = torch.nn.functional.leaky_relu(model.backbone.nn1(z))
        z = model.backbone.nn2(z)
        pooled = torch.cat(
            [
                z.max(1).values,
                z.min(1).values,
                z.sum(1),
                z.mean(1),
                torch.zeros(B, 4),
                torch.full((B, 1), float(L)),
            ],
            dim=1,
        )
        out = torch.nn.functional.leaky_relu(pooled)
        out = torch.nn.functional.leaky_relu(model.backbone.nn3(out))
        return model._tasks[0]._affine(out)

    def test_golden_activations(self):
        from graphnet_tpu.models.gnn.dynedge_jinst import DynEdgeJINST

        tmodel = self._torch_model()
        xs = _inputs(3)
        with torch.no_grad():
            ref = self._torch_forward(tmodel, torch.from_numpy(xs))

        model = StandardModel(
            backbone=DynEdgeJINST(nb_inputs=D, layer_size_scale=self.C),
            tasks=(_task(32),),
        )
        batch = make_batch([xs[i] for i in range(B)], length=L)
        template = model.init(jax.random.PRNGKey(0), batch)
        params = port_jinst_state_dict(tmodel.state_dict(), template)
        (pred, _), = model.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(pred), ref.numpy(), rtol=5e-3, atol=5e-3
        )


class TestPortConvNet:
    NI = 8  # nb_intermediate
    NO = 6  # backbone nb_outputs

    def _torch_model(self, seed=0):
        torch.manual_seed(seed)
        ni, inter2 = self.NI, 6 * self.NI

        class TAGConvSim(torch.nn.Module):
            # PyG TAGConv layout: per-hop `lins` (K+1 Linears)
            def __init__(self, din, dout, hops=2):
                super().__init__()
                self.lins = torch.nn.ModuleList(
                    [torch.nn.Linear(din, dout) for _ in range(hops + 1)]
                )

        class BackboneSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = TAGConvSim(D, ni)
                self.conv2 = TAGConvSim(ni, ni)
                self.conv3 = TAGConvSim(ni, ni)
                self.batchnorm1 = torch.nn.BatchNorm1d(inter2)
                for j in range(1, 6):
                    setattr(
                        self, f"linear{j}", torch.nn.Linear(inter2, inter2)
                    )
                self.out = torch.nn.Linear(inter2, TestPortConvNet.NO)

        class TaskSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._affine = torch.nn.Linear(TestPortConvNet.NO, 1)

        class ModelSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = BackboneSim()
                self._tasks = torch.nn.ModuleList([TaskSim()])

        model = ModelSim()
        # non-trivial running statistics (a trained model's would be)
        g = torch.Generator().manual_seed(seed + 1)
        model.backbone.batchnorm1.running_mean = torch.randn(
            inter2, generator=g
        )
        model.backbone.batchnorm1.running_var = (
            torch.rand(inter2, generator=g) + 0.5
        )
        return model.eval()

    def _torch_forward(self, model, x):
        # reference forward `convnet.py:65-118` with TAGConv's gcn_norm
        # (no self-loops) as a dense normalised adjacency
        idx = _knn(x)
        A = torch.zeros(B, L, L)
        A.scatter_(2, idx, 1.0)
        deg = A.sum(-1)
        dis = torch.where(
            deg > 0, deg.clamp(min=1e-12).rsqrt(), torch.zeros(())
        )
        An = A * dis[:, :, None] * dis[:, None, :]

        h, pools = x, []
        for conv in (
            model.backbone.conv1,
            model.backbone.conv2,
            model.backbone.conv3,
        ):
            out, hh = conv.lins[0](h), h
            for hop in range(1, len(conv.lins)):
                hh = An @ hh
                out = out + conv.lins[hop](hh)
            h = torch.nn.functional.leaky_relu(out)
            pools.append(torch.cat([h.sum(1), h.max(1).values], dim=1))
        z = model.backbone.batchnorm1(torch.cat(pools, dim=1))
        for j in range(1, 6):
            z = torch.nn.functional.leaky_relu(
                getattr(model.backbone, f"linear{j}")(z)
            )
        out = model.backbone.out(z)
        return model._tasks[0]._affine(out)

    def test_golden_activations(self):
        from graphnet_tpu.models.gnn.convnet import ConvNet

        tmodel = self._torch_model()
        xs = _inputs(4)
        with torch.no_grad():
            ref = self._torch_forward(tmodel, torch.from_numpy(xs))

        model = StandardModel(
            backbone=ConvNet(
                nb_inputs=D,
                nb_outputs_=self.NO,
                nb_intermediate=self.NI,
                frozen_batchnorm=True,
            ),
            tasks=(_task(self.NO),),
        )
        batch = make_batch([xs[i] for i in range(B)], length=L)
        template = model.init(jax.random.PRNGKey(0), batch)
        params = port_convnet_state_dict(tmodel.state_dict(), template)
        (pred, _), = model.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(pred), ref.numpy(), rtol=5e-3, atol=5e-3
        )

    def test_single_bias_layout(self):
        """Older PyG TAGConv layout: bias-free `lins` + one module-level
        `bias` parameter — must port identically (bias sum)."""
        from graphnet_tpu.models.gnn.convnet import ConvNet

        tmodel = self._torch_model(seed=7)
        sd = {}
        for k, v in tmodel.state_dict().items():
            m = None
            import re

            m = re.match(r"(backbone\.conv\d)\.lins\.(\d+)\.bias$", k)
            if m:
                root = m.group(1)
                sd.setdefault(f"{root}.bias", torch.zeros_like(v))
                sd[f"{root}.bias"] = sd[f"{root}.bias"] + v
            else:
                sd[k] = v

        xs = _inputs(5)
        with torch.no_grad():
            ref = self._torch_forward(tmodel, torch.from_numpy(xs))
        model = StandardModel(
            backbone=ConvNet(
                nb_inputs=D,
                nb_outputs_=self.NO,
                nb_intermediate=self.NI,
                frozen_batchnorm=True,
            ),
            tasks=(_task(self.NO),),
        )
        batch = make_batch([xs[i] for i in range(B)], length=L)
        template = model.init(jax.random.PRNGKey(0), batch)
        params = port_convnet_state_dict(sd, template)
        (pred, _), = model.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(pred), ref.numpy(), rtol=5e-3, atol=5e-3
        )


class TestRealZooPort:
    """Port every real reference QUESO zoo config end to end: translate
    the config, synthesise a reference-layout state_dict with the exact
    shapes the torch model would have (``gnn/dynedge.py:190-249``), run
    :func:`port_reference_model`, and predict."""

    PATTERN = (
        "/root/reference/src/graphnet/models/pretrained/icecube/"
        "upgrade/QUESO/*/*_config.yml"
    )

    @staticmethod
    def _synth_reference_state_dict(model, rng):
        bb = model.backbone
        nb_in = bb.nb_inputs
        gv = nb_in + 5  # feature means + 4 homophily + log10 n_pulses
        after = bb.add_global_variables_after_pooling
        sd = {}

        def lin(key, din, dout):
            sd[f"{key}.weight"] = (
                rng.standard_normal((dout, din)).astype(np.float32) * 0.05
            )
            sd[f"{key}.bias"] = (
                rng.standard_normal((dout,)).astype(np.float32) * 0.05
            )

        d = nb_in + (0 if after else gv)
        for i, sizes in enumerate(bb.dynedge_layer_sizes):
            prev = 2 * d
            for j, s in enumerate(sizes):
                lin(f"backbone._conv_layers.{i}.nn.{2 * j}", prev, s)
                prev = s
            d = sizes[-1]
        prev = nb_in + (0 if after else gv) + sum(
            s[-1] for s in bb.dynedge_layer_sizes
        )
        for j, s in enumerate(bb.post_processing_layer_sizes):
            lin(f"backbone._post_processing.{2 * j}", prev, s)
            prev = s
        schemes = bb.global_pooling_schemes
        prev = prev * (len(schemes) if schemes else 1) + (gv if after else 0)
        for j, s in enumerate(bb.readout_layer_sizes):
            lin(f"backbone._readout.{2 * j}", prev, s)
            prev = s
        for t, task in enumerate(model.tasks):
            lin(f"_tasks.{t}._affine", prev, task.nb_inputs)
        return sd

    def test_port_and_predict_all(self, tmp_path):
        import glob
        import os

        from graphnet_tpu.utils.weight_port import (
            from_reference_config,
            port_reference_model,
        )

        paths = sorted(glob.glob(self.PATTERN))
        if not paths:
            pytest.skip("reference zoo not available")
        rng = np.random.default_rng(0)
        for p in paths:
            name = os.path.basename(os.path.dirname(p))
            model, _ = from_reference_config(p)
            sd = self._synth_reference_state_dict(model, rng)
            sd_path = str(tmp_path / f"{name}.pkl")
            import pickle

            with open(sd_path, "wb") as f:
                pickle.dump(sd, f)
            ported_model, _, params = port_reference_model(p, sd_path)

            d = ported_model.backbone.nb_inputs
            events = [
                rng.standard_normal((L, d)).astype(np.float32)
                for _ in range(2)
            ]
            batch = make_batch(events, length=L)
            outputs = ported_model.apply(params, batch, inference=True)
            for (pred, _reg), task in zip(outputs, ported_model.tasks):
                pred = np.asarray(pred)
                assert np.isfinite(pred).all(), name
                if getattr(task, "node_level", False):
                    assert pred.shape[:2] == (2, L), (name, pred.shape)
                else:
                    assert pred.shape[0] == 2, (name, pred.shape)


class TestReferenceExampleConfigs:
    """All shipped reference example configs
    (``/root/reference/configs/models/*.yml``) translate: softmax
    transform resolved from the table (never eval'd), KNNEdges k/columns
    folded from the captured edge_definition into KNNGraph."""

    def test_translate_all(self):
        import glob

        from graphnet_tpu.utils.weight_port import from_reference_config

        paths = sorted(glob.glob("/root/reference/configs/models/*.yml"))
        if not paths:
            pytest.skip("reference example configs not available")
        for p in paths:
            model, gd = from_reference_config(p)
            assert model.backbone is not None and model.tasks
            assert gd is not None

    def test_knn_edge_definition_folded(self, tmp_path):
        """A non-default k inside the captured edge_definition must
        survive into the translated KNNGraph."""
        import yaml

        from graphnet_tpu.utils.weight_port import _build_component

        cfg = {
            "class_name": "KNNGraph",
            "arguments": {
                "detector": {
                    "ModelConfig": {
                        "class_name": "Prometheus",
                        "arguments": {},
                    }
                },
                "edge_definition": {
                    "ModelConfig": {
                        "class_name": "KNNEdges",
                        "arguments": {
                            "nb_nearest_neighbours": 16,
                            "columns": [0, 1, 3],
                        },
                    }
                },
            },
        }
        gd = _build_component(cfg)
        ed = gd.edge_definition
        assert ed.nb_nearest_neighbours == 16
        assert tuple(ed.columns) == (0, 1, 3)

    def test_softmax_transform(self):
        from graphnet_tpu.utils.weight_port import _resolve_lambda

        fn = _resolve_lambda(
            "!lambda x: torch.nn.functional.softmax(x, dim=-1)"
        )
        import jax.numpy as jnp

        out = np.asarray(fn(jnp.asarray([[0.0, 1.0, 2.0]])))
        np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)


class TestReferenceDatasetConfigs:
    """Reference DatasetConfig YAMLs (flat format,
    ``utilities/config/dataset_config.py:32``) build real datasets on the
    bundled example data."""

    def test_sqlite_named_selections(self):
        import os

        from graphnet_tpu.utils.weight_port import (
            from_reference_dataset_config,
        )

        p = (
            "/root/reference/configs/datasets/"
            "training_example_data_sqlite.yml"
        )
        if not os.path.exists(p):
            pytest.skip("reference dataset configs not available")
        ds = from_reference_dataset_config(p)
        assert set(ds) == {"train", "validation", "test"}
        total = sum(len(v) for v in ds.values())
        assert total == 50  # the bundled example DB
        # `event_no % 5` selections partition the events disjointly
        seen = [
            int(np.asarray(e.labels["event_no"]).item())
            for v in ds.values()
            for e in (v[i] for i in range(len(v)))
        ]
        assert len(seen) == len(set(seen)) == total
        ev = ds["train"][0]
        assert ev.x.shape[1] == 4  # PROMETHEUS features

    def test_classification_config(self):
        import os

        from graphnet_tpu.utils.weight_port import (
            from_reference_dataset_config,
        )

        p = (
            "/root/reference/configs/datasets/"
            "training_classification_example_data_sqlite.yml"
        )
        if not os.path.exists(p):
            pytest.skip("reference dataset configs not available")
        ds = from_reference_dataset_config(p)
        anyds = next(iter(ds.values())) if isinstance(ds, dict) else ds
        assert len(anyds) > 0
        assert anyds[0].x.shape[0] >= 1


class TestReviewRegressions:
    def test_ported_transforms_registered_eagerly(self):
        """Transforms used by ported configs live in the builtin registry
        so a saved ported model loads in a fresh process (previously they
        were registered lazily inside _resolve_lambda only)."""
        from graphnet_tpu.utils.config import TRANSFORM_REGISTRY

        for name in ("softmax", "log10_half", "pow10_double"):
            assert name in TRANSFORM_REGISTRY, name

    def test_particlenet_none_pooling_is_node_level(self):
        from graphnet_tpu.models.gnn.particlenet import ParticleNeT

        model = ParticleNeT(
            nb_inputs=D,
            nb_neighbours=4,
            dynedge_layer_sizes=((8, 8),),
            readout_layer_sizes=(6,),
            global_pooling_schemes=None,
        )
        xs = _inputs(9)
        batch = make_batch([xs[i] for i in range(B)], length=L)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.shape == (B, L, 6)  # per-node readout

    def test_dataset_config_top_level_ensemble(self, tmp_path):
        import yaml

        from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
        from graphnet_tpu.data.dataset import EnsembleDataset
        from graphnet_tpu.utils.weight_port import (
            from_reference_dataset_config,
        )

        cfg = {
            "path": EXAMPLE_SQLITE_DATA,
            "graph_definition": {
                "class_name": "KNNGraph",
                "arguments": {
                    "detector": {
                        "class_name": "Prometheus",
                        "arguments": {},
                    }
                },
            },
            "pulsemaps": ["total"],
            "features": ["sensor_pos_x", "sensor_pos_y",
                         "sensor_pos_z", "t"],
            "truth": ["total_energy"],
            "truth_table": "mc_truth",
            "selection": ["event_no % 2 == 0", "event_no % 2 == 1"],
        }
        p = str(tmp_path / "ds.yml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        ds = from_reference_dataset_config(p)
        assert isinstance(ds, EnsembleDataset)
        assert len(ds) == 50  # both halves of the bundled DB

    def test_frozen_stat_decay_mask(self):
        from graphnet_tpu.utils.weight_port import frozen_stat_decay_mask

        params = {
            "params": {
                "backbone": {
                    "bn_scale": np.ones(3),
                    "bn_mean": np.zeros(3),
                    "bn_var": np.ones(3),
                    "conv_0": {
                        "bn_0": {"scale": np.ones(2), "mean": np.zeros(2)},
                        "self_dense": {"kernel": np.ones((2, 2))},
                    },
                }
            }
        }
        m = frozen_stat_decay_mask(params)
        bb = m["params"]["backbone"]
        assert bb["bn_scale"] is True
        assert bb["bn_mean"] is False and bb["bn_var"] is False
        assert bb["conv_0"]["bn_0"]["mean"] is False
        assert bb["conv_0"]["bn_0"]["scale"] is True
        assert bb["conv_0"]["self_dense"]["kernel"] is True


class TestPortParticleNeT:
    SIZES = ((8, 8), (16, 16))
    READOUT = (12,)

    def _torch_model(self, seed=0):
        torch.manual_seed(seed)

        class ConvSim(torch.nn.Module):
            def __init__(self, d_in, sizes):
                super().__init__()
                layers, prev = [], d_in
                for ix, s in enumerate(sizes):
                    nb_in = prev * 2 if ix == 0 else prev
                    layers += [
                        torch.nn.Linear(nb_in, s),
                        torch.nn.BatchNorm1d(s),
                        torch.nn.ReLU(),
                    ]
                    prev = s
                self.nn = torch.nn.Sequential(*layers)

        class BackboneSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._conv_layers = torch.nn.ModuleList()
                d = D
                for sizes in TestPortParticleNeT.SIZES:
                    self._conv_layers.append(ConvSim(d, sizes))
                    d = sizes[-1]
                layers, prev = [], d  # 1 pooling scheme ("mean")
                for s in TestPortParticleNeT.READOUT:
                    layers += [
                        torch.nn.Linear(prev, s),
                        torch.nn.ReLU(),
                        torch.nn.Dropout(0.1),
                    ]
                    prev = s
                self._readout = torch.nn.Sequential(*layers)

        class TaskSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._affine = torch.nn.Linear(
                    TestPortParticleNeT.READOUT[-1], 1
                )

        class ModelSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = BackboneSim()
                self._tasks = torch.nn.ModuleList([TaskSim()])

        model = ModelSim()
        g = torch.Generator().manual_seed(seed + 1)
        for conv in model.backbone._conv_layers:
            for mod in conv.nn:
                if isinstance(mod, torch.nn.BatchNorm1d):
                    c = mod.num_features
                    mod.running_mean = torch.randn(c, generator=g) * 0.1
                    mod.running_var = torch.rand(c, generator=g) + 0.5
        return model.eval()

    def _torch_forward(self, model, x):
        # reference forward `particlenet.py:240-255` (dynamic kNN, mean
        # aggregation and pooling); eval-mode BatchNorm applied manually
        # because torch's BatchNorm1d rejects the [B,L,k,C] edge tensor
        idx = _knn(x)
        h = x
        for conv in model.backbone._conv_layers:
            xj = _gather(h, idx)
            xi = h[:, :, None, :].expand_as(xj)
            m = torch.cat([xi, xj - xi], dim=-1)
            for mod in conv.nn:
                if isinstance(mod, torch.nn.BatchNorm1d):
                    m = (m - mod.running_mean) / torch.sqrt(
                        mod.running_var + mod.eps
                    ) * mod.weight + mod.bias
                else:
                    m = mod(m)
            h = m.mean(2)
            idx = _knn(h)
        z = h.mean(1)
        z = model.backbone._readout(z)
        return model._tasks[0]._affine(z)

    def test_golden_activations(self):
        from graphnet_tpu.models.gnn.particlenet import ParticleNeT

        tmodel = self._torch_model()
        xs = _inputs(6)
        with torch.no_grad():
            ref = self._torch_forward(tmodel, torch.from_numpy(xs))

        model = StandardModel(
            backbone=ParticleNeT(
                nb_inputs=D,
                nb_neighbours=K,
                dynedge_layer_sizes=self.SIZES,
                readout_layer_sizes=self.READOUT,
                global_pooling_schemes=("mean",),
                frozen_batchnorm=True,
            ),
            tasks=(_task(self.READOUT[-1]),),
        )
        batch = make_batch([xs[i] for i in range(B)], length=L)
        template = model.init(jax.random.PRNGKey(0), batch)
        params = port_particlenet_state_dict(tmodel.state_dict(), template)
        (pred, _), = model.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(pred), ref.numpy(), rtol=5e-3, atol=5e-3
        )
