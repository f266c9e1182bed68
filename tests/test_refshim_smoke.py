"""Fast-tier smoke of the refshim machinery (VERDICT r3 item 8).

The executed-reference parity tests are all `slow`; this cheap check
catches a broken shim import / reference load in the 5-minute loop: it
loads the reference package through the shims and runs ONE tiny
EdgeConv-level forward against our implementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import refshim

if not refshim.reference_available():  # pragma: no cover
    pytest.skip("no reference checkout", allow_module_level=True)


def test_refshim_loads_and_tiny_edgeconv_matches():
    ref = refshim.load_reference()
    assert ref.__name__ == "graphnet"

    import torch_cluster
    import torch_geometric  # the shims

    assert getattr(torch_geometric, "__refshim__", False)

    # one 8-node, k=3 EdgeConv through the shim MessagePassing machinery
    from torch_geometric.nn import EdgeConv

    torch.manual_seed(0)
    x = torch.randn(8, 4)
    edge_index = torch_cluster.knn_graph(x[:, :3], k=3)
    mlp = torch.nn.Linear(8, 5)
    conv = EdgeConv(mlp, aggr="add").eval()
    with torch.no_grad():
        out = conv(x, edge_index)  # [8, 5]

    # same math by hand: sum_j mlp([x_i, x_j - x_i])
    src, dst = edge_index
    msgs = mlp(torch.cat([x[dst], x[src] - x[dst]], dim=1))
    expected = torch.zeros(8, 5).index_add_(0, dst, msgs.detach())
    np.testing.assert_allclose(
        out.numpy(), expected.detach().numpy(), rtol=1e-5, atol=1e-6
    )
