"""Graph construction: detectors feed node/edge definitions."""

from graphnet_tpu.models.graphs.edges import (
    EdgeDefinition,
    EuclideanEdges,
    KNNEdges,
    MinkowskiKNNEdges,
    RadialEdges,
)
from graphnet_tpu.models.graphs.graph_definition import Event, GraphDefinition
from graphnet_tpu.models.graphs.graphs import EdgelessGraph, KNNGraph
from graphnet_tpu.models.graphs.nodes import (
    IceMixNodes,
    NodeAsDOMTimeSeries,
    NodeDefinition,
    NodesAsPulses,
    PercentileClusters,
)
