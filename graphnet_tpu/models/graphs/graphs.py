"""Pre-configured graph definitions (mirror of reference
``src/graphnet/models/graphs/graphs.py``)."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from graphnet_tpu.models.detector.detector import Detector
from graphnet_tpu.models.graphs.edges import KNNEdges
from graphnet_tpu.models.graphs.graph_definition import GraphDefinition
from graphnet_tpu.models.graphs.nodes import NodeDefinition
from graphnet_tpu.utils.config import save_config


class KNNGraph(GraphDefinition):
    """kNN(k=8) graph on columns (0,1,2) with NodesAsPulses
    (reference ``graphs.py:13-58``)."""

    @save_config
    def __init__(
        self,
        detector: Detector,
        node_definition: Optional[NodeDefinition] = None,
        input_feature_names: Optional[List[str]] = None,
        perturbation_dict: Optional[Dict[str, float]] = None,
        seed: Optional[Union[int, np.random.Generator]] = None,
        nb_nearest_neighbours: int = 8,
        columns: tuple = (0, 1, 2),
        **kwargs,
    ) -> None:
        super().__init__(
            detector=detector,
            node_definition=node_definition,
            edge_definition=KNNEdges(
                nb_nearest_neighbours=nb_nearest_neighbours,
                columns=tuple(columns),
            ),
            input_feature_names=input_feature_names,
            perturbation_dict=perturbation_dict,
            seed=seed,
            **kwargs,
        )


class EdgelessGraph(GraphDefinition):
    """Node set without edges, for transformer backbones
    (reference ``graphs.py:61-100``)."""

    def __init__(
        self,
        detector: Detector,
        node_definition: Optional[NodeDefinition] = None,
        input_feature_names: Optional[List[str]] = None,
        perturbation_dict: Optional[Dict[str, float]] = None,
        seed: Optional[Union[int, np.random.Generator]] = None,
        **kwargs,
    ) -> None:
        super().__init__(
            detector=detector,
            node_definition=node_definition,
            edge_definition=None,
            input_feature_names=input_feature_names,
            perturbation_dict=perturbation_dict,
            seed=seed,
            **kwargs,
        )
