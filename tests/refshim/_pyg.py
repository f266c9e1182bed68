"""Pure-torch shims for torch_scatter / torch_cluster / torch_geometric.

Each function re-implements the documented behavior of the third-party
API at exactly the call sites the reference uses (cited per function).
No reference code is copied — these mirror the *dependency* semantics so
the reference's own source can execute.

Determinism notes (these matter for golden activations):

* ``knn``/``knn_graph`` break distance ties toward the LOWER point index
  (stable lexsort on (distance, index)), computed in float64 — the
  torch_cluster CPU behavior for exact ties, and stable under fp32 noise.
* scatter reductions use torch ``index_add_`` / ``scatter_reduce_`` on
  CPU, which are deterministic.
* empty segments: sum/mean → 0, min/max → 0 (torch_scatter zero-fills
  untouched outputs), matching torch_scatter's composite ops.
"""

from __future__ import annotations

import inspect
import sys
import types
from typing import List, Optional, Tuple

import torch
from torch import Tensor


# --------------------------------------------------------------------------
# torch_scatter
# --------------------------------------------------------------------------


def _broadcast(index: Tensor, src: Tensor, dim: int) -> Tensor:
    """torch_scatter's index broadcasting: expand a 1-D index along `dim`
    to src's shape."""
    if dim < 0:
        dim = src.dim() + dim
    if index.dim() == 1:
        for _ in range(dim):
            index = index.unsqueeze(0)
    while index.dim() < src.dim():
        index = index.unsqueeze(-1)
    return index.expand_as(src)


def _out_shape(src: Tensor, dim: int, dim_size: Optional[int], index: Tensor):
    if dim < 0:
        dim = src.dim() + dim
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() > 0 else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    return shape, dim, dim_size


def scatter_sum(src, index, dim=-1, out=None, dim_size=None):
    shape, dim, dim_size = _out_shape(src, dim, dim_size, index)
    idx = _broadcast(index, src, dim)
    if out is None:
        out = src.new_zeros(shape)
    return out.scatter_add(dim, idx, src)


scatter_add = scatter_sum


def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
    total = scatter_sum(src, index, dim, None, dim_size)
    ones = torch.ones_like(src)
    count = scatter_sum(ones, index, dim, None, dim_size).clamp(min=1)
    result = total / count
    if out is not None:
        out.copy_(result)
        return out
    return result


def _scatter_arg_reduce(src, index, dim, dim_size, reduce):
    """(values, argindices) like torch_scatter.scatter_{min,max}: untouched
    outputs are 0, untouched args are `dim_size` (out-of-range)."""
    shape, dim, dim_size = _out_shape(src, dim, dim_size, index)
    idx = _broadcast(index, src, dim)
    out = src.new_zeros(shape)
    out.scatter_reduce_(dim, idx, src, reduce=reduce, include_self=False)
    # arg: positions whose value equals the segment extremum (lowest wins)
    pos = torch.arange(src.size(dim), device=src.device, dtype=torch.long)
    view = [1] * src.dim()
    view[dim] = -1
    pos = pos.view(view).expand_as(src)
    hit = src == out.gather(dim, idx)
    big = src.size(dim)
    cand = torch.where(hit, pos, torch.full_like(pos, big))
    arg = torch.full(shape, dim_size, dtype=torch.long, device=src.device)
    arg.scatter_reduce_(dim, idx, cand, reduce="amin", include_self=False)
    arg = torch.where(arg == big, torch.full_like(arg, dim_size), arg)
    return out, arg


def scatter_min(src, index, dim=-1, out=None, dim_size=None):
    assert out is None
    return _scatter_arg_reduce(src, index, dim, dim_size, "amin")


def scatter_max(src, index, dim=-1, out=None, dim_size=None):
    assert out is None
    return _scatter_arg_reduce(src, index, dim, dim_size, "amax")


def scatter_std(src, index, dim=-1, out=None, dim_size=None, unbiased=True):
    mean = scatter_mean(src, index, dim, None, dim_size)
    idx = _broadcast(index, src, dim if dim >= 0 else src.dim() + dim)
    dev = src - mean.gather(dim if dim >= 0 else src.dim() + dim, idx)
    var_sum = scatter_sum(dev * dev, index, dim, None, dim_size)
    ones = torch.ones_like(src)
    count = scatter_sum(ones, index, dim, None, dim_size)
    denom = (count - 1).clamp(min=1) if unbiased else count.clamp(min=1)
    return (var_sum / denom).sqrt()


def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    if reduce in ("sum", "add"):
        return scatter_sum(src, index, dim, out, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, out, dim_size)
    if reduce == "min":
        return scatter_min(src, index, dim, out, dim_size)[0]
    if reduce == "max":
        return scatter_max(src, index, dim, out, dim_size)[0]
    raise ValueError(f"unknown reduce {reduce!r}")


# --------------------------------------------------------------------------
# torch_cluster
# --------------------------------------------------------------------------


def knn(
    x: Tensor,
    y: Tensor,
    k: int,
    batch_x: Optional[Tensor] = None,
    batch_y: Optional[Tensor] = None,
    cosine: bool = False,
    num_workers: int = 1,
) -> Tensor:
    """For each point in `y`, its k nearest points in `x` (same batch
    segment).  Returns [2, E]: row 0 = index into y, row 1 = index into x.
    Distances in float64; ties break toward the lower x index."""
    assert not cosine
    if batch_x is None:
        batch_x = torch.zeros(x.size(0), dtype=torch.long)
    if batch_y is None:
        batch_y = torch.zeros(y.size(0), dtype=torch.long)
    rows: List[Tensor] = []
    cols: List[Tensor] = []
    for b in torch.unique(batch_x):
        xm = (batch_x == b).nonzero(as_tuple=True)[0]
        ym = (batch_y == b).nonzero(as_tuple=True)[0]
        if xm.numel() == 0 or ym.numel() == 0:
            continue
        d = torch.cdist(y[ym].double(), x[xm].double())  # [ny, nx]
        kk = min(k, xm.numel())
        # lexsort on (distance, index): stable sort of index-sorted cols
        order = d.argsort(dim=1, stable=True)[:, :kk]  # [ny, kk]
        rows.append(ym.repeat_interleave(kk))
        cols.append(xm[order.reshape(-1)])
    if not rows:
        return torch.empty(2, 0, dtype=torch.long)
    return torch.stack([torch.cat(rows), torch.cat(cols)], dim=0)


def knn_graph(
    x: Tensor,
    k: int,
    batch: Optional[Tensor] = None,
    loop: bool = False,
    flow: str = "source_to_target",
    cosine: bool = False,
    num_workers: int = 1,
) -> Tensor:
    """torch_cluster.knn_graph: kNN edges within each batch segment.

    flow='source_to_target' (the default used everywhere in the
    reference, e.g. `models/components/layers.py:63-67`) returns
    edge_index[0] = neighbor (source j), edge_index[1] = center
    (target i)."""
    assert flow in ("source_to_target", "target_to_source")
    edge_index = knn(x, x, k if loop else k + 1, batch, batch, cosine)
    if flow == "source_to_target":
        row, col = edge_index[1], edge_index[0]
    else:
        row, col = edge_index[0], edge_index[1]
    if not loop:
        mask = row != col
        row, col = row[mask], col[mask]
    return torch.stack([row, col], dim=0)


def radius(
    x: Tensor,
    y: Tensor,
    r: float,
    batch_x: Optional[Tensor] = None,
    batch_y: Optional[Tensor] = None,
    max_num_neighbors: int = 32,
) -> Tensor:
    if batch_x is None:
        batch_x = torch.zeros(x.size(0), dtype=torch.long)
    if batch_y is None:
        batch_y = torch.zeros(y.size(0), dtype=torch.long)
    rows, cols = [], []
    for b in torch.unique(batch_x):
        xm = (batch_x == b).nonzero(as_tuple=True)[0]
        ym = (batch_y == b).nonzero(as_tuple=True)[0]
        d = torch.cdist(y[ym].double(), x[xm].double())
        within = d <= r
        for qi in range(ym.numel()):
            nbr = within[qi].nonzero(as_tuple=True)[0][:max_num_neighbors]
            rows.append(ym[qi].repeat(nbr.numel()))
            cols.append(xm[nbr])
    if not rows:
        return torch.empty(2, 0, dtype=torch.long)
    return torch.stack([torch.cat(rows), torch.cat(cols)], dim=0)


def radius_graph(
    x: Tensor,
    r: float,
    batch: Optional[Tensor] = None,
    loop: bool = False,
    max_num_neighbors: int = 32,
    flow: str = "source_to_target",
) -> Tensor:
    edge_index = radius(x, x, r, batch, batch, max_num_neighbors + 1)
    if flow == "source_to_target":
        row, col = edge_index[1], edge_index[0]
    else:
        row, col = edge_index[0], edge_index[1]
    if not loop:
        mask = row != col
        row, col = row[mask], col[mask]
    return torch.stack([row, col], dim=0)


# --------------------------------------------------------------------------
# torch_geometric.data: Data / Batch
# --------------------------------------------------------------------------

_DATA_RESERVED = {
    "_store",
    "_num_nodes",
    "_slices",
    "training",  # nn.Module interplay not needed; Data is plain
}


class Data:
    """Minimal PyG Data: a named tensor container.

    Supports the access patterns the reference uses: attribute and
    item get/set (`graph_definition.py:224-248`), `num_nodes`, `x`,
    `edge_index`, `batch`, iteration over keys, `.to(device)`.
    """

    def __init__(self, x=None, edge_index=None, edge_attr=None, **kwargs):
        object.__setattr__(self, "_store", {})
        if x is not None:
            self.x = x
        if edge_index is not None:
            self.edge_index = edge_index
        if edge_attr is not None:
            self.edge_attr = edge_attr
        for key, value in kwargs.items():
            if value is not None:
                setattr(self, key, value)

    def __setattr__(self, key, value):
        if key in _DATA_RESERVED or key.startswith("__"):
            object.__setattr__(self, key, value)
        else:
            self._store[key] = value

    def __getattr__(self, key):
        store = object.__getattribute__(self, "_store")
        if key in store:
            return store[key]
        raise AttributeError(key)

    def __setitem__(self, key, value):
        self._store[key] = value

    def __getitem__(self, key):
        return self._store[key]

    def __contains__(self, key):
        return key in self._store

    def __delitem__(self, key):
        del self._store[key]

    @property
    def keys(self):
        return list(self._store.keys())

    @property
    def num_nodes(self):
        if "num_nodes" in self._store:
            return self._store["num_nodes"]
        if "x" in self._store and self._store["x"] is not None:
            return self._store["x"].size(0)
        return None

    @property
    def num_graphs(self):
        return 1

    def to(self, device, *args, **kwargs):
        for k, v in self._store.items():
            if torch.is_tensor(v):
                self._store[k] = v.to(device)
        return self

    def clone(self):
        out = Data()
        for k, v in self._store.items():
            out[k] = v.clone() if torch.is_tensor(v) else v
        return out


class Batch(Data):
    """PyG Batch: concatenation of Data objects with a `batch` vector.

    `__cat_dim__`/`__inc__` defaults: `edge_index` concatenates on dim 1
    with a per-graph node-count offset; node-aligned tensors concatenate
    on dim 0; scalars become 1-element tensors and concatenate."""

    @classmethod
    def from_data_list(cls, data_list: List[Data]) -> "Batch":
        batch = cls()
        keys = list(data_list[0]._store.keys())
        n_nodes = [int(d.num_nodes) for d in data_list]
        device = None
        for d in data_list:
            x = d._store.get("x")
            if torch.is_tensor(x):
                device = x.device
                break

        for key in keys:
            vals = [d._store[key] for d in data_list]
            if key == "edge_index":
                offset = 0
                parts = []
                for v, n in zip(vals, n_nodes):
                    parts.append(v + offset)
                    offset += n
                batch[key] = torch.cat(parts, dim=1)
            elif torch.is_tensor(vals[0]):
                vals = [
                    v.reshape(1) if v.dim() == 0 else v for v in vals
                ]
                batch[key] = torch.cat(vals, dim=0)
            else:
                vals = [torch.as_tensor(v).reshape(-1) for v in vals]
                batch[key] = torch.cat(vals, dim=0)

        batch.batch = torch.cat(
            [
                torch.full((n,), i, dtype=torch.long, device=device)
                for i, n in enumerate(n_nodes)
            ]
        )
        batch.ptr = torch.tensor(
            [0] + list(torch.tensor(n_nodes).cumsum(0)), dtype=torch.long
        )
        object.__setattr__(batch, "_data_list_lens", n_nodes)
        return batch

    @property
    def num_graphs(self):
        return int(self.batch.max()) + 1 if self.batch.numel() else 0

    def to_data_list(self) -> List[Data]:
        n_nodes = getattr(self, "_data_list_lens", None)
        if n_nodes is None:
            counts = torch.bincount(self.batch)
            n_nodes = [int(c) for c in counts]
        starts = [0]
        for n in n_nodes:
            starts.append(starts[-1] + n)
        out = []
        for i, n in enumerate(n_nodes):
            d = Data()
            lo, hi = starts[i], starts[i + 1]
            for k, v in self._store.items():
                if k in ("batch", "ptr"):
                    continue
                if k == "edge_index":
                    m = (v[0] >= lo) & (v[0] < hi)
                    d[k] = v[:, m] - lo
                elif torch.is_tensor(v) and v.size(0) == starts[-1]:
                    d[k] = v[lo:hi]
                elif torch.is_tensor(v) and v.size(0) == len(n_nodes):
                    d[k] = v[i]
                else:
                    d[k] = v
            out.append(d)
        return out


# --------------------------------------------------------------------------
# torch_geometric.nn: MessagePassing / EdgeConv / TAGConv / pooling
# --------------------------------------------------------------------------


def _segment_reduce(src, index, dim_size, aggr):
    shape = (dim_size,) + src.shape[1:]
    if aggr in ("add", "sum"):
        out = src.new_zeros(shape)
        return out.index_add(0, index, src)
    if aggr == "mean":
        out = src.new_zeros(shape).index_add(0, index, src)
        count = src.new_zeros(dim_size).index_add(
            0, index, torch.ones(src.size(0), dtype=src.dtype)
        )
        return out / count.clamp(min=1).unsqueeze(-1)
    if aggr in ("max", "min"):
        out = src.new_zeros(shape)
        idx = index.unsqueeze(-1).expand_as(src)
        out.scatter_reduce_(
            0, idx, src, reduce="amax" if aggr == "max" else "amin",
            include_self=False,
        )
        return out
    raise ValueError(f"unknown aggr {aggr!r}")


class MessagePassing(torch.nn.Module):
    """Gather→message→scatter, flow='source_to_target': messages flow from
    edge_index[0] (source j) to edge_index[1] (target i)."""

    def __init__(
        self,
        aggr: str = "add",
        flow: str = "source_to_target",
        node_dim: int = -2,
        **kwargs,
    ):
        super().__init__()
        self.aggr = aggr
        self.flow = flow

    def propagate(self, edge_index, size=None, **kwargs):
        x = kwargs.pop("x", None)
        if torch.is_tensor(x):
            x = (x, x)
        if self.flow == "source_to_target":
            src_idx, dst_idx = edge_index[0], edge_index[1]
        else:
            src_idx, dst_idx = edge_index[1], edge_index[0]

        msg_kwargs = {}
        for name in inspect.signature(self.message).parameters:
            if name in ("self",):
                continue
            if name.endswith("_i") or name.endswith("_j"):
                base = name[:-2]
                pair = x if base == "x" else kwargs.get(base)
                if torch.is_tensor(pair):
                    pair = (pair, pair)
                idx = dst_idx if name.endswith("_i") else src_idx
                side = 1 if name.endswith("_i") else 0
                msg_kwargs[name] = pair[side][idx]
            elif name in kwargs:
                msg_kwargs[name] = kwargs[name]
        out = self.message(**msg_kwargs)
        dim_size = x[1].size(0) if x is not None else int(dst_idx.max()) + 1
        out = self.aggregate(out, dst_idx, dim_size=dim_size)
        return self.update(out)

    def message(self, x_j):  # pragma: no cover - always overridden
        return x_j

    def aggregate(self, inputs, index, dim_size):
        return _segment_reduce(inputs, index, dim_size, self.aggr)

    def update(self, inputs):
        return inputs

    def reset_parameters(self):
        pass


class EdgeConv(MessagePassing):
    """PyG EdgeConv: message = nn(cat[x_i, x_j - x_i]), default aggr max
    (`models/components/layers.py:20` subclasses with aggr='add')."""

    def __init__(self, nn, aggr: str = "max", **kwargs):
        super().__init__(aggr=aggr, **kwargs)
        self.nn = nn

    def reset_parameters(self):
        reset(self.nn)

    def forward(self, x, edge_index):
        if torch.is_tensor(x):
            x = (x, x)
        return self.propagate(edge_index, x=x, size=None)

    def message(self, x_i, x_j):
        return self.nn(torch.cat([x_i, x_j - x_i], dim=-1))


def _gcn_norm_no_self_loops(edge_index, num_nodes, dtype):
    """gcn_norm as TAGConv uses it (add_self_loops=False): symmetric
    D^-1/2 A D^-1/2 edge weights."""
    row, col = edge_index[0], edge_index[1]
    w = torch.ones(row.size(0), dtype=dtype)
    deg = torch.zeros(num_nodes, dtype=dtype).index_add(0, col, w)
    dis = deg.pow(-0.5)
    dis[dis == float("inf")] = 0
    return dis[row] * w * dis[col]


class TAGConv(MessagePassing):
    """PyG TAGConv: out = Σ_{h=0..K} lin_h(Â^h x), Â = D^-1/2 A D^-1/2
    (used by `gnn/convnet.py:44-46` with K=2)."""

    def __init__(self, in_channels, out_channels, K=3, bias=True,
                 normalize=True, **kwargs):
        super().__init__(aggr="add", **kwargs)
        self.K = K
        self.normalize = normalize
        self.lins = torch.nn.ModuleList(
            [
                torch.nn.Linear(in_channels, out_channels, bias=bias)
                for _ in range(K + 1)
            ]
        )

    def forward(self, x, edge_index, edge_weight=None):
        if self.normalize:
            edge_weight = _gcn_norm_no_self_loops(
                edge_index, x.size(0), x.dtype
            )
        elif edge_weight is None:
            edge_weight = torch.ones(edge_index.size(1), dtype=x.dtype)
        out = self.lins[0](x)
        for lin in self.lins[1:]:
            x = self.propagate(edge_index, x=x, edge_weight=edge_weight)
            out = out + lin(x)
        return out

    def message(self, x_j, edge_weight):
        return edge_weight.view(-1, 1) * x_j


def global_add_pool(x, batch, size=None):
    size = size or (int(batch.max()) + 1 if batch.numel() else 0)
    return _segment_reduce(x, batch, size, "add")


def global_max_pool(x, batch, size=None):
    size = size or (int(batch.max()) + 1 if batch.numel() else 0)
    return _segment_reduce(x, batch, size, "max")


def global_mean_pool(x, batch, size=None):
    size = size or (int(batch.max()) + 1 if batch.numel() else 0)
    return _segment_reduce(x, batch, size, "mean")


def reset(value):
    """torch_geometric.nn.inits.reset: recursively call
    reset_parameters()."""
    if hasattr(value, "reset_parameters"):
        value.reset_parameters()
    else:
        for child in getattr(value, "children", lambda: [])():
            reset(child)


# ---- torch_geometric.nn.pool helpers (used by components/pool.py) --------


def consecutive_cluster(src: Tensor) -> Tuple[Tensor, Tensor]:
    unique, inv = torch.unique(src, sorted=True, return_inverse=True)
    perm = inv.new_empty(unique.size(0)).scatter_(
        0, inv, torch.arange(inv.size(0), device=inv.device)
    )
    return inv, perm


def pool_edge(cluster, edge_index, edge_attr=None):
    num_nodes = cluster.size(0)
    edge_index = cluster[edge_index.view(-1)].view(2, -1)
    mask = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]
    if edge_index.numel() > 0:
        # coalesce: unique edges
        idx = edge_index[0] * num_nodes + edge_index[1]
        _, perm = torch.unique(idx, return_inverse=False), None
        uniq, first = torch.unique(idx, sorted=True, return_inverse=True)
        keep = torch.zeros(
            uniq.size(0), dtype=torch.long
        ).scatter_(0, first, torch.arange(idx.size(0)))
        edge_index = edge_index[:, keep]
        if edge_attr is not None:
            edge_attr = edge_attr[keep]
    return edge_index, edge_attr


def pool_batch(perm, batch):
    return batch[perm]


def pool_pos(cluster, pos):
    return scatter_mean(pos, cluster, dim=0)


def avg_pool_x(cluster, x, batch, size=None):
    cluster, perm = consecutive_cluster(cluster)
    x = scatter_mean(x, cluster, dim=0, dim_size=size)
    batch = pool_batch(perm, batch)
    return x, batch


def max_pool_x(cluster, x, batch, size=None):
    cluster, perm = consecutive_cluster(cluster)
    x = scatter_max(x, cluster, dim=0, dim_size=size)[0]
    batch = pool_batch(perm, batch)
    return x, batch


def _pool_data(cluster, data, reduce):
    cluster, perm = consecutive_cluster(cluster)
    x = scatter(data.x, cluster, dim=0, reduce=reduce)
    edge_index, edge_attr = pool_edge(
        cluster, data.edge_index, data._store.get("edge_attr")
    )
    batch = (
        pool_batch(perm, data.batch) if "batch" in data._store else None
    )
    pos = (
        pool_pos(cluster, data.pos) if "pos" in data._store else None
    )
    out = Batch(x=x, edge_index=edge_index, edge_attr=edge_attr, pos=pos)
    if batch is not None:
        out.batch = batch
    return out


def avg_pool(cluster, data, transform=None):
    out = _pool_data(cluster, data, "mean")
    return transform(out) if transform is not None else out


def max_pool(cluster, data, transform=None):
    out = _pool_data(cluster, data, "max")
    return transform(out) if transform is not None else out


# --------------------------------------------------------------------------
# torch_geometric.utils
# --------------------------------------------------------------------------


def to_dense_batch(
    x: Tensor,
    batch: Optional[Tensor] = None,
    fill_value: float = 0.0,
    max_num_nodes: Optional[int] = None,
    batch_size: Optional[int] = None,
) -> Tuple[Tensor, Tensor]:
    """[N, D] + batch → ([B, L, D], [B, L] bool mask)
    (`models/components/layers.py:193`, `gnn/icemix.py:137`)."""
    if batch is None:
        batch = torch.zeros(x.size(0), dtype=torch.long)
    B = batch_size or (int(batch.max()) + 1 if batch.numel() else 0)
    counts = torch.bincount(batch, minlength=B)
    L = max_num_nodes or int(counts.max()) if counts.numel() else 0
    ptr = torch.zeros(B + 1, dtype=torch.long)
    ptr[1:] = counts.cumsum(0)
    within = torch.arange(x.size(0)) - ptr[batch]
    keep = within < L
    out = x.new_full((B, L) + x.shape[1:], fill_value)
    mask = torch.zeros(B, L, dtype=torch.bool)
    out[batch[keep], within[keep]] = x[keep]
    mask[batch[keep], within[keep]] = True
    return out, mask


def homophily(edge_index, y, batch=None, method: str = "edge"):
    """Edge homophily: fraction of edges whose endpoint `y`s are equal
    (`models/utils.py:25-28` calls this per coordinate with batch)."""
    assert method == "edge"
    row, col = edge_index[0], edge_index[1]
    eq = (y[row] == y[col]).float()
    if batch is None:
        return float(eq.mean()) if eq.numel() else 0.0
    B = int(batch.max()) + 1
    return scatter_mean(eq, batch[col], dim=0, dim_size=B)


def degree(index, num_nodes=None, dtype=None):
    num_nodes = num_nodes or (int(index.max()) + 1 if index.numel() else 0)
    out = torch.zeros(num_nodes, dtype=dtype or torch.float32)
    return out.index_add(
        0, index, torch.ones(index.numel(), dtype=out.dtype)
    )


# --------------------------------------------------------------------------
# module assembly
# --------------------------------------------------------------------------


def install() -> None:
    if "torch_geometric" in sys.modules and hasattr(
        sys.modules["torch_geometric"], "__refshim__"
    ):
        return

    ts = types.ModuleType("torch_scatter")
    ts.__refshim__ = True
    for fn in (
        scatter,
        scatter_sum,
        scatter_add,
        scatter_mean,
        scatter_min,
        scatter_max,
        scatter_std,
    ):
        setattr(ts, fn.__name__, fn)
    ts.scatter_add = scatter_add
    sys.modules["torch_scatter"] = ts

    tc = types.ModuleType("torch_cluster")
    tc.__refshim__ = True
    tc.knn = knn
    tc.knn_graph = knn_graph
    tc.radius = radius
    tc.radius_graph = radius_graph
    sys.modules["torch_cluster"] = tc

    tg = types.ModuleType("torch_geometric")
    tg.__refshim__ = True
    tg.__path__ = []

    data_mod = types.ModuleType("torch_geometric.data")
    data_mod.Data = Data
    data_mod.Batch = Batch
    tg.data = data_mod

    nn_mod = types.ModuleType("torch_geometric.nn")
    nn_mod.__path__ = []
    nn_mod.EdgeConv = EdgeConv
    nn_mod.MessagePassing = MessagePassing
    nn_mod.TAGConv = TAGConv
    nn_mod.knn_graph = knn_graph
    nn_mod.radius_graph = radius_graph
    nn_mod.global_add_pool = global_add_pool
    nn_mod.global_max_pool = global_max_pool
    nn_mod.global_mean_pool = global_mean_pool
    tg.nn = nn_mod

    conv_mod = types.ModuleType("torch_geometric.nn.conv")
    conv_mod.MessagePassing = MessagePassing
    nn_mod.conv = conv_mod

    inits_mod = types.ModuleType("torch_geometric.nn.inits")
    inits_mod.reset = reset
    nn_mod.inits = inits_mod

    pool_mod = types.ModuleType("torch_geometric.nn.pool")
    pool_mod.__path__ = []
    pool_mod.knn_graph = knn_graph
    pool_mod.radius_graph = radius_graph
    pool_mod.avg_pool = avg_pool
    pool_mod.max_pool = max_pool
    pool_mod.avg_pool_x = avg_pool_x
    pool_mod.max_pool_x = max_pool_x
    nn_mod.pool = pool_mod

    consecutive_mod = types.ModuleType("torch_geometric.nn.pool.consecutive")
    consecutive_mod.consecutive_cluster = consecutive_cluster
    pool_mod.consecutive = consecutive_mod

    poolpool_mod = types.ModuleType("torch_geometric.nn.pool.pool")
    poolpool_mod.pool_edge = pool_edge
    poolpool_mod.pool_batch = pool_batch
    poolpool_mod.pool_pos = pool_pos
    pool_mod.pool = poolpool_mod

    typing_mod = types.ModuleType("torch_geometric.typing")
    typing_mod.Adj = Tensor
    typing_mod.PairTensor = Tuple[Tensor, Tensor]
    typing_mod.OptTensor = Optional[Tensor]
    tg.typing = typing_mod

    utils_mod = types.ModuleType("torch_geometric.utils")
    utils_mod.to_dense_batch = to_dense_batch
    utils_mod.homophily = homophily
    utils_mod.degree = degree
    tg.utils = utils_mod

    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = data_mod
    sys.modules["torch_geometric.nn"] = nn_mod
    sys.modules["torch_geometric.nn.conv"] = conv_mod
    sys.modules["torch_geometric.nn.inits"] = inits_mod
    sys.modules["torch_geometric.nn.pool"] = pool_mod
    sys.modules["torch_geometric.nn.pool.consecutive"] = consecutive_mod
    sys.modules["torch_geometric.nn.pool.pool"] = poolpool_mod
    sys.modules["torch_geometric.typing"] = typing_mod
    sys.modules["torch_geometric.utils"] = utils_mod
