"""Torch→flax weight porting for DeepIce (IceMix): golden-activation parity.

Builds an independent pure-torch model with the reference's exact
state_dict key layout (``backbone.fourier_ext.*``, ``backbone.rel_pos.*``,
``backbone.sandwich.{i}.*``, ``backbone.cls_token``, ``backbone.blocks.{i}.*``,
optional ``backbone.dyn_edge.*`` — ``gnn/icemix.py:31-167``,
``components/layers.py:276-598``, ``components/embedding.py:11-176``) and
reference forward semantics, ports its weights with
:func:`graphnet_tpu.utils.weight_port.port_deepice_state_dict`, and asserts
end-to-end predictions match.

Covers the kaggle zoo families: plain ``B_d*`` (no dynedge, unscaled
embeddings) and ``*+DynEdge`` (nested ``add_norm_layer=True,
skip_readout=True`` DynEdge; scaled embeddings exercised here too).
"""

import math

import numpy as np
import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax

from graphnet_tpu.batch import make_batch
from graphnet_tpu.models.gnn.icemix import DeepIce
from graphnet_tpu.models.standard_model import StandardModel
from graphnet_tpu.models.task.task import IdentityTask
from graphnet_tpu.training.loss_functions import LogCoshLoss
from graphnet_tpu.utils.weight_port import port_deepice_state_dict

B, L, F = 2, 16, 6
HID = 64  # hidden_dim
SEQ = 32  # base feature dim (seq_length)
DEPTH = 2
DEPTH_REL = 2
N_REL = 1
HEADS = HID // 16  # head_size=16

DYN_LAYERS = [(16, 24), (24, 24)]
DYN_POST = [24, HID // 2]
DYN_K = 4


def _sin_emb(x, dim, scale=None):
    half = dim / 2
    emb = torch.exp(
        torch.arange(int(half)) * (-math.log(10000.0) / half)
    )
    emb = x.unsqueeze(-1) * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if scale is not None:
        emb = emb * scale
    return emb


class _FourierSim(torch.nn.Module):
    def __init__(self, out_dim, scaled):
        super().__init__()

        class _Emb(torch.nn.Module):
            def __init__(self, dim):
                super().__init__()
                if scaled:
                    self.scale = torch.nn.Parameter(
                        torch.ones(1) * dim**-0.5
                    )

        self.sin_emb = _Emb(SEQ)
        self.sin_emb2 = _Emb(SEQ // 2)
        self.aux_emb = torch.nn.Embedding(2, SEQ // 2)
        hidden = 6 * SEQ
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(hidden, hidden),
            torch.nn.LayerNorm(hidden),
            torch.nn.GELU(),
            torch.nn.Linear(hidden, out_dim),
        )
        self._scaled = scaled

    def forward(self, x, seq_lengths):
        s1 = self.sin_emb.scale if self._scaled else None
        s2 = self.sin_emb2.scale if self._scaled else None
        embs = [_sin_emb(4096 * x[:, :, :3], SEQ, s1).flatten(-2)]
        embs.append(_sin_emb(1024 * x[:, :, 4], SEQ, s1))
        embs.append(_sin_emb(4096 * x[:, :, 3], SEQ, s1))
        embs.append(self.aux_emb(x[:, :, 5].long()))
        length = torch.log10(seq_lengths.to(x.dtype))
        embs.append(
            _sin_emb(length, SEQ // 2, s2)
            .unsqueeze(1)
            .expand(-1, x.shape[1], -1)
        )
        return self.mlp(torch.cat(embs, dim=-1))


class _SpacetimeSim(torch.nn.Module):
    # reference embedding.py:139-176
    def __init__(self, head_size):
        super().__init__()
        self.projection = torch.nn.Linear(head_size, head_size)
        self.head_size = head_size

    def forward(self, x):
        pos, time = x[:, :, :3], x[:, :, 3]
        st = (pos[:, :, None] - pos[:, None, :]).pow(2).sum(-1) - (
            (time[:, :, None] - time[:, None, :]) * (3e4 / 500 * 3e-1)
        ).pow(2)
        four = torch.sign(st) * torch.sqrt(torch.abs(st))
        return self.projection(
            _sin_emb(1024 * four.clip(-4, 4), self.head_size)
        )


class _MlpSim(torch.nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.input_projection = torch.nn.Linear(dim, hidden)
        self.output_projection = torch.nn.Linear(hidden, dim)

    def forward(self, x):
        return self.output_projection(
            torch.nn.functional.gelu(self.input_projection(x))
        )


class _AttnRelSim(torch.nn.Module):
    # reference layers.py:389-500 with qkv_bias=False (DeepIce default)
    def __init__(self, dim, heads):
        super().__init__()
        self.proj_q = torch.nn.Linear(dim, dim, bias=False)
        self.proj_k = torch.nn.Linear(dim, dim, bias=False)
        self.proj_v = torch.nn.Linear(dim, dim, bias=False)
        self.proj = torch.nn.Linear(dim, dim)
        self.heads = heads
        self.scale = (dim // heads) ** -0.5

    def forward(self, x, rel_pos_bias):
        Bq, Lq, D = x.shape

        def split(t):
            return t.reshape(Bq, Lq, self.heads, -1).permute(0, 2, 1, 3)

        q = split(self.proj_q(x)) * self.scale
        k = split(self.proj_k(x))
        v = split(self.proj_v(x))
        attn = q @ k.transpose(-2, -1)
        if rel_pos_bias is not None:
            attn = attn + torch.einsum("bhic,bijc->bhij", q, rel_pos_bias)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2)
        if rel_pos_bias is not None:
            out = out + torch.einsum("bhij,bijc->bihc", attn, rel_pos_bias)
        return self.proj(out.reshape(Bq, Lq, D))


class _BlockRelSim(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = _AttnRelSim(dim, heads)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.mlp = _MlpSim(dim, 4 * dim)

    def forward(self, x, rel_pos_bias):
        x = x + self.attn(self.norm1(x), rel_pos_bias)
        return x + self.mlp(self.norm2(x))


class _BlockSim(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.mlp = _MlpSim(dim, 4 * dim)
        self.gamma_1 = torch.nn.Parameter(torch.ones(dim))
        self.gamma_2 = torch.nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xn = self.norm1(x)
        x = x + self.gamma_1 * self.attn(xn, xn, xn, need_weights=False)[0]
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class _DynEdgeSim(torch.nn.Module):
    """Reference-layout DynEdge with add_norm_layer=True, gelu,
    skip_readout=True (`gnn/dynedge.py:190-249` — `_readout` is built
    even when skipped)."""

    def __init__(self):
        super().__init__()
        gv = F + 5
        self._conv_layers = torch.nn.ModuleList()
        d_in = F + gv
        for sizes in DYN_LAYERS:
            layers, prev = [], 2 * d_in
            for s in sizes:
                layers += [
                    torch.nn.Linear(prev, s),
                    torch.nn.LayerNorm(s),
                    torch.nn.GELU(),
                ]
                prev = s
            self._conv_layers.append(
                type(
                    "EdgeConvSim",
                    (torch.nn.Module,),
                    {},
                )()
            )
            self._conv_layers[-1].nn = torch.nn.Sequential(*layers)
            d_in = sizes[-1]
        post_in = F + gv + sum(s[-1] for s in DYN_LAYERS)
        layers, prev = [], post_in
        for s in DYN_POST:
            layers += [
                torch.nn.Linear(prev, s),
                torch.nn.LayerNorm(s),
                torch.nn.GELU(),
            ]
            prev = s
        self._post_processing = torch.nn.Sequential(*layers)
        # built but unused (skip_readout)
        self._readout = torch.nn.Sequential(
            torch.nn.Linear(DYN_POST[-1], 8), torch.nn.GELU()
        )

    def forward(self, x):
        gv = F + 5
        k = DYN_K

        def knn(h):
            d2 = torch.cdist(h[..., :3].double(), h[..., :3].double()) ** 2
            d2 += torch.eye(L, dtype=torch.float64)[None] * 1e12
            return d2.topk(k, largest=False).indices

        g = torch.cat(
            [
                x.mean(1),
                torch.zeros(B, 4),
                torch.log10(torch.full((B, 1), float(L))),
            ],
            dim=1,
        )
        h = torch.cat([x, g[:, None, :].expand(B, L, gv)], dim=-1)
        idx = knn(x)
        skips = [h]
        for conv in self._conv_layers:
            d = h.shape[-1]
            xj = torch.gather(
                h[:, :, None, :].expand(B, L, k, d),
                1,
                idx[..., None].expand(B, L, k, d),
            )
            xi = h[:, :, None, :].expand_as(xj)
            msg = conv.nn(torch.cat([xi, xj - xi], dim=-1))
            h = msg.sum(2)
            idx = knn(h)
            skips.append(h)
        return self._post_processing(torch.cat(skips, dim=-1))


class _DeepIceSim(torch.nn.Module):
    def __init__(self, scaled=False, include_dynedge=False):
        super().__init__()
        fourier_out = HID // 2 if include_dynedge else HID
        self.fourier_ext = _FourierSim(fourier_out, scaled)
        self.rel_pos = _SpacetimeSim(16)
        self.sandwich = torch.nn.ModuleList(
            _BlockRelSim(HID, HEADS) for _ in range(DEPTH_REL)
        )
        self.cls_token = torch.nn.Linear(HID, 1, bias=False)
        self.blocks = torch.nn.ModuleList(
            _BlockSim(HID, HEADS) for _ in range(DEPTH)
        )
        if include_dynedge:
            self.dyn_edge = _DynEdgeSim()
        self.include_dynedge = include_dynedge

    def forward(self, x):
        seq_lengths = torch.full((B,), L)
        h = self.fourier_ext(x, seq_lengths)
        rel = self.rel_pos(x)
        if self.include_dynedge:
            h = torch.cat([h, self.dyn_edge(x)], dim=2)
        for i, blk in enumerate(self.sandwich):
            h = blk(h, rel if i < N_REL else None)
        cls = self.cls_token.weight.unsqueeze(0).expand(B, -1, -1)
        h = torch.cat([cls, h], dim=1)
        for blk in self.blocks:
            h = blk(h)
        return h[:, 0]


class _ModelSim(torch.nn.Module):
    def __init__(self, scaled=False, include_dynedge=False):
        super().__init__()
        self.backbone = _DeepIceSim(scaled, include_dynedge)

        class TaskSim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._affine = torch.nn.Linear(HID, 3)

        self._tasks = torch.nn.ModuleList([TaskSim()])

    def forward(self, x):
        return self._tasks[0]._affine(self.backbone(x))


def _flax_model(scaled, include_dynedge):
    dynedge_args = None
    if include_dynedge:
        dynedge_args = dict(
            nb_inputs=F,
            nb_neighbours=DYN_K,
            dynedge_layer_sizes=tuple(DYN_LAYERS),
            post_processing_layer_sizes=tuple(DYN_POST),
            global_pooling_schemes=None,
            activation_layer="gelu",
            add_norm_layer=True,
            skip_readout=True,
        )
    return StandardModel(
        backbone=DeepIce(
            hidden_dim=HID,
            seq_length=SEQ,
            depth=DEPTH,
            head_size=16,
            depth_rel=DEPTH_REL,
            n_rel=N_REL,
            scaled_emb=scaled,
            include_dynedge=include_dynedge,
            dynedge_args=dynedge_args,
            n_features=F,
        ),
        tasks=(
            IdentityTask(
                nb_outputs=3,
                loss_function=LogCoshLoss(),
                target_labels=("direction",),
            ),
        ),
    )


@pytest.mark.parametrize(
    "scaled,include_dynedge",
    [(False, False), (True, True)],
    ids=["plain", "scaled+dynedge"],
)
def test_deepice_golden_activations(scaled, include_dynedge):
    torch.manual_seed(0)
    tmodel = _ModelSim(scaled=scaled, include_dynedge=include_dynedge)

    rng = np.random.default_rng(0)
    # 2x scale spreads pairwise distances so fp32-vs-fp64 kNN in the
    # nested DynEdge can't flip near-tied neighbours
    xs = 2.0 * rng.standard_normal((B, L, F)).astype(np.float32)
    xs[:, :, 5] = (xs[:, :, 5] > 0).astype(np.float32)  # aux is 0/1

    with torch.no_grad():
        golden = tmodel(torch.from_numpy(xs)).numpy()

    model = _flax_model(scaled, include_dynedge)
    batch = make_batch([xs[i] for i in range(B)], length=L)
    template = model.init(jax.random.PRNGKey(0), batch)
    params = port_deepice_state_dict(tmodel.state_dict(), template)
    ((pred, _),) = model.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(pred), golden, rtol=2e-3, atol=2e-3
    )


def test_unported_keys_raise():
    torch.manual_seed(0)
    tmodel = _ModelSim()
    model = _flax_model(False, False)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((B, L, F)).astype(np.float32)
    xs[:, :, 5] = 0.0
    batch = make_batch([xs[i] for i in range(B)], length=L)
    template = model.init(jax.random.PRNGKey(0), batch)
    sd = dict(tmodel.state_dict())
    sd["backbone.stray.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="unported"):
        port_deepice_state_dict(sd, template)
