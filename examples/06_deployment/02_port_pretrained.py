"""Port a trained GraphNeT (torch) model and serve it from this framework.

The migration path for reference users (docs/migration.md): a reference
ModelConfig YAML + torch state_dict →
:func:`graphnet_tpu.utils.weight_port.port_reference_model` →
``(model, graph_definition, flax_params)`` → saved as our config+params →
:class:`~graphnet_tpu.deployment.deployment_module.DeploymentModule`.

Since no trained torch artifact ships in this repo, the script first
*builds* one: a randomly-initialised torch model with the reference's
exact state_dict layout (``gnn/dynedge.py:190-249`` Sequential naming)
standing in for a real checkpoint — the porting/serving flow is
byte-for-byte the one a real ``*_state_dict.pth`` would take.
Golden-activation parity of the port itself is covered by
``tests/test_weight_port*.py`` for every GNN backbone family.
"""

import os
import pickle

import numpy as np
import yaml

from graphnet_tpu.constants import EXAMPLE_SQLITE_DATA
from graphnet_tpu.data.constants import FEATURES, TRUTH
from graphnet_tpu.data.sqlite_dataset import SQLiteDataset
from graphnet_tpu.deployment.deployment_module import DeploymentModule
from graphnet_tpu.utils.argparse import ArgumentParser
from graphnet_tpu.utils.config import save_model_config
from graphnet_tpu.utils.logging import Logger
from graphnet_tpu.utils.weight_port import port_reference_model

FEATURES_IN = FEATURES.PROMETHEUS  # 4 per-pulse features


def make_reference_artifacts(outdir: str) -> None:
    """Write a reference-style ``model_config.yml`` + pickled state_dict
    (the two files a GraphNeT user has for a trained model)."""
    import torch

    d = len(FEATURES_IN)
    gv = d + 5  # global variables: feature means + 4 homophily + log10 n
    sizes = [(128, 256), (336, 256), (336, 256), (336, 256)]

    def mlp(d_in, layer_sizes):
        layers, prev = [], d_in
        for s in layer_sizes:
            layers += [torch.nn.Linear(prev, s), torch.nn.ReLU()]
            prev = s
        return torch.nn.Sequential(*layers)

    class EdgeConvSim(torch.nn.Module):
        def __init__(self, nn_module):
            super().__init__()
            self.nn = nn_module

    class BackboneSim(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self._conv_layers = torch.nn.ModuleList()
            prev = d + gv
            for s in sizes:
                self._conv_layers.append(EdgeConvSim(mlp(2 * prev, s)))
                prev = s[-1]
            self._post_processing = mlp(
                d + gv + sum(s[-1] for s in sizes), [336, 256]
            )
            self._readout = mlp(256 * 4, [128])  # 4 pooling schemes

    class ModelSim(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = BackboneSim()
            self._tasks = torch.nn.ModuleList()
            task = torch.nn.Module()
            task._affine = torch.nn.Linear(128, 1)
            self._tasks.append(task)

    torch.manual_seed(42)
    model = ModelSim()
    with open(os.path.join(outdir, "ref_state_dict.pkl"), "wb") as f:
        pickle.dump(
            {k: v.numpy() for k, v in model.state_dict().items()}, f
        )

    cfg = {
        "class_name": "StandardModel",
        "arguments": {
            "backbone": {
                "ModelConfig": {
                    "class_name": "DynEdge",
                    "arguments": {
                        "nb_inputs": d,
                        "global_pooling_schemes": [
                            "min", "max", "mean", "sum",
                        ],
                    },
                }
            },
            "graph_definition": {
                "ModelConfig": {
                    "class_name": "KNNGraph",
                    "arguments": {
                        "detector": {
                            "ModelConfig": {
                                "class_name": "Prometheus",
                                "arguments": {},
                            }
                        },
                        "node_definition": {
                            "ModelConfig": {
                                "class_name": "NodesAsPulses",
                                "arguments": {},
                            }
                        },
                        "input_feature_names": list(FEATURES_IN),
                        "nb_nearest_neighbours": 8,
                        "columns": [0, 1, 2],
                    },
                }
            },
            "optimizer_class": "!class torch.optim.adam Adam",
            "optimizer_kwargs": {"eps": 0.001, "lr": 0.001},
            "tasks": [
                {
                    "ModelConfig": {
                        "class_name": "IdentityTask",
                        "arguments": {
                            "hidden_size": 128,
                            "nb_outputs": 1,
                            "target_labels": "total_energy",
                            "loss_function": {
                                "ModelConfig": {
                                    "class_name": "LogCoshLoss",
                                    "arguments": {},
                                }
                            },
                            "transform_target":
                                "!lambda x: torch.log10(x)",
                            "transform_inference":
                                "!lambda x: torch.pow(10,x)",
                        },
                    }
                }
            ],
        },
    }
    with open(os.path.join(outdir, "ref_model_config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)


def main() -> None:
    parser = ArgumentParser(
        description="Port a reference torch model and serve it"
    )
    parser.add_argument("--workdir", default="/tmp/port_pretrained")
    parser.add_argument(
        "--ref-config", default=None,
        help="reference ModelConfig YAML (defaults to a generated one)",
    )
    parser.add_argument(
        "--ref-state-dict", default=None,
        help="torch state_dict (.pth or pickled dict of arrays)",
    )
    args = parser.parse_args()
    logger = Logger()

    os.makedirs(args.workdir, exist_ok=True)
    if (args.ref_config is None) != (args.ref_state_dict is None):
        parser.error(
            "--ref-config and --ref-state-dict must be given together "
            "(or both omitted to use generated stand-in artifacts)"
        )
    if args.ref_config is None:
        make_reference_artifacts(args.workdir)
        args.ref_config = os.path.join(
            args.workdir, "ref_model_config.yml"
        )
        args.ref_state_dict = os.path.join(
            args.workdir, "ref_state_dict.pkl"
        )
        logger.info(
            f"Generated stand-in reference artifacts in {args.workdir}"
        )

    # --- the actual migration: 1 call ---------------------------------
    model, graph_definition, params = port_reference_model(
        args.ref_config, args.ref_state_dict
    )
    logger.info(
        f"Ported {type(model.backbone).__name__} with "
        f"{len(model.tasks)} task head(s)"
    )

    # persist in OUR format and serve through the deployment surface
    ported = os.path.join(args.workdir, "ported")
    os.makedirs(ported, exist_ok=True)
    save_model_config(model, os.path.join(ported, "model.yml"))
    with open(os.path.join(ported, "state_dict.pkl"), "wb") as f:
        pickle.dump(params, f)

    module = DeploymentModule(
        os.path.join(ported, "model.yml"),
        os.path.join(ported, "state_dict.pkl"),
    )
    ds = SQLiteDataset(
        path=EXAMPLE_SQLITE_DATA,
        graph_definition=graph_definition,
        pulsemaps="total",
        features=FEATURES_IN,
        truth=TRUTH.PROMETHEUS,
        truth_table="mc_truth",
    )
    events = [ds[i] for i in range(8)]
    preds = module(events)
    assert np.isfinite(np.asarray(preds)).all()
    logger.info(
        f"Served {len(events)} events through the ported model; "
        f"predictions: {np.asarray(preds).ravel()}"
    )


if __name__ == "__main__":
    main()
