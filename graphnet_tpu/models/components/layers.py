"""Flax layers used by the GNN backbones.

TPU-native counterparts of the reference's
``src/graphnet/models/components/layers.py``.  All layers operate on the
dense-padded ``[B, L, D]`` layout of :class:`graphnet_tpu.batch.EventBatch`.
The EdgeConv family is expressed as neighbour-gather → fused MLP → masked
reduction over the regular ``[B, L, k]`` neighbour axis (no sparse scatter) —
the per-edge MLP is a single ``[B*L*k, 2D] @ [2D, H]`` matmul the MXU eats
whole.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.ops import (
    edge_reduce,
    gather_neighbors,
    knn_graph,
)

# opt-in switch for the fused EdgeConv+kNN kernel — measured slower
# in-model than the standalone kernels (see EdgeConv.knn_k), kept for
# future shapes where the balance may differ
FUSE_CONV_KNN = False

Activation = Callable[[jax.Array], jax.Array]

from graphnet_tpu.ops.gelu import gelu_exact

ACTIVATIONS = {
    "relu": nn.relu,
    # exact (erf) form: torch nn.GELU/F.gelu default is exact, while
    # flax nn.gelu defaults to the tanh approximation (~1e-3
    # differences).  gelu_exact carries a recompute VJP — plain
    # autodiff's fp32 residuals cost +0.66 ms/block at the DeepIce
    # shape (ops/gelu.py)
    "gelu": gelu_exact,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "silu": nn.silu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def resolve_activation(act) -> Activation:
    if callable(act):
        return act
    return ACTIVATIONS[act.lower()]


class MLP(nn.Module):
    """``[Linear, (LayerNorm), activation] * n`` — mirrors the torch
    ``Sequential`` blocks built in the reference's DynEdge
    (``gnn/dynedge.py:190-210``)."""

    sizes: Sequence[int]
    activation: str = "relu"
    add_norm_layer: bool = False
    activate_final: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = resolve_activation(self.activation)
        for i, size in enumerate(self.sizes):
            x = nn.Dense(size, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.add_norm_layer:
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}"
                )(x)
            if self.activate_final or i + 1 < len(self.sizes):
                x = act(x)
        return x


def edge_conv_message_inputs(
    x: jax.Array, idx: jax.Array, tito: bool = False
) -> jax.Array:
    """Build EdgeConv message inputs.

    Standard EdgeConv (PyG semantics, reference ``layers.py:20``):
        ``cat[x_i, x_j - x_i]``             → ``[B, L, k, 2D]``
    TITO variant (reference ``layers.py:106-110``):
        ``cat[x_i, x_j - x_i, x_j]``        → ``[B, L, k, 3D]``
    """
    x_j = gather_neighbors(x, idx)  # [B, L, k, D]
    x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
    if tito:
        return jnp.concatenate([x_i, x_j - x_i, x_j], axis=-1)
    return jnp.concatenate([x_i, x_j - x_i], axis=-1)


class EdgeConv(nn.Module):
    """EdgeConv: message MLP over ``cat[x_i, x_j - x_i]``, masked aggregation.

    Functional equivalent of PyG ``EdgeConv`` (reference ``layers.py:20``,
    message at torch_geometric's EdgeConv.message) on dense neighbour lists.

    The first linear layer is *linearised*: since
    ``cat[x_i, x_j - x_i] @ [W1; W2] = x_i @ (W1 - W2) + x_j @ W2``
    (and the TITO 3-way message analogously), it is computed per **node**
    (N matmuls) instead of per **edge** (N·k matmuls), and the
    ``[B, L, k, 2D]`` message-input tensor is never materialised — the
    per-edge work starts at the activation.  Exact same math, ~2x fewer
    first-layer FLOPs and far less HBM traffic.
    """

    nn_sizes: Sequence[int]
    aggr: str = "max"
    activation: str = "relu"
    add_norm_layer: bool = False
    tito: bool = False
    dtype: Optional[jnp.dtype] = None
    # when set (k, (lo, hi)): also return the kNN of the conv output over
    # columns [lo:hi], computed INSIDE the fused kernel while the output
    # is still in VMEM.  Engages only on the fused path with add/max
    # aggregation at L <= 128; the caller must handle the tuple return.
    #
    # MEASURED NEGATIVE RESULT (v5e, canonical DynEdge B=128 L=128, bf16,
    # paired in-process ablation 2026-08-19): the fusion wins its
    # microbench (0.67 vs 0.79 ms/layer) but LOSES in-model — fwd 3.01
    # vs 2.90 ms, full step 6.32 vs 6.24 ms.  The conv->kNN "glue" it
    # removes was not the cost; the kNN work itself is, and the kernel
    # pays it serially per event inside the conv program while the
    # standalone kNN kernel pipelines across its own grid.  Default OFF
    # (FUSE_CONV_KNN); kernel + tests kept for the record.
    knn_k: int = 0
    knn_subset: Optional[Tuple[int, int]] = None

    def _use_fused_knn(self, L: int, mask) -> bool:
        return (
            FUSE_CONV_KNN
            and self.knn_k > 0
            and self.knn_subset is not None
            and mask is not None
            and self.aggr in ("add", "max")  # mean divides AFTER the
            # kernel, which would change the coords the kNN sees
            and L <= 128
            and self._use_fused(L)
        )

    def _use_fused(self, L: int) -> bool:
        """The fused Pallas kernel covers 2-layer (leaky-)relu add/max
        configurations (DynEdge's and TITO's) on TPU, within VMEM
        limits.  ``mean`` rides the add kernel: the division by the
        per-node valid-edge count happens outside the kernel (exact —
        the count does not depend on the messages)."""
        if (
            len(self.nn_sizes) != 2
            or self.aggr not in ("add", "max", "mean")
            or self.activation not in ("relu", "leaky_relu")
            or self.add_norm_layer
        ):
            return False
        if jax.default_backend() != "tpu":
            return False
        from graphnet_tpu.parallel.graph_sharding import (
            current_graph_mesh,
        )

        if current_graph_mesh() is not None:
            # GSPMD cannot partition a pallas_call; under node-axis
            # sharding the XLA formulation (which GSPMD shards) runs
            return False
        max_l = 2048 if self.dtype == jnp.bfloat16 else 1024
        return L >= 8 and L <= max_l and L % min(L, 128) == 0

    def _halo_hints(self, x: jax.Array):
        """Under node-axis (``graph``) sharding, steer GSPMD's halo:
        all-gather the conv INPUT at the compute dtype (bf16 halves the
        bytes; d_in=256 < h0=336 columns for DynEdge) and compute the
        neighbour-term dense redundantly per shard — ONE gather per
        layer whose cotangent is the matching reduce-scatter, while the
        edge-MLP FLOPs stay sharded over query rows.  Without the hint
        GSPMD replicates the fp32 ``[B, L, h0]`` neighbour term instead
        (docs/architecture.md §4a).  Returns ``(x_for_nbr_dense,
        constrain_out)``."""
        from graphnet_tpu.parallel.graph_sharding import (
            current_graph_mesh,
        )

        gmesh = current_graph_mesh()
        if gmesh is None or x.ndim != 3:
            return x, lambda out: out

        from jax.sharding import NamedSharding, PartitionSpec as P

        xg = x.astype(self.dtype) if self.dtype is not None else x
        x_nbr = jax.lax.with_sharding_constraint(
            xg, NamedSharding(gmesh, P("data", None, None))
        )

        def constrain_out(out):
            return jax.lax.with_sharding_constraint(
                out, NamedSharding(gmesh, P("data", "graph", None))
            )

        return x_nbr, constrain_out

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        idx: jax.Array,
        edge_mask: jax.Array,
        mask: Optional[jax.Array] = None,
    ):
        act = resolve_activation(self.activation)
        h0 = self.nn_sizes[0]
        x_nbr, constrain_out = self._halo_hints(x)
        # self-term: x_i @ (W1 - W2) + bias   (tito: W1 - W2)
        a = nn.Dense(h0, dtype=self.dtype, name="self_dense")(x)
        # neighbour-term: x_j @ W2            (tito: x_j @ (W2 + W3))
        b = nn.Dense(
            h0, use_bias=False, dtype=self.dtype, name="nbr_dense"
        )(x_nbr)

        if len(self.nn_sizes) == 2 and not self.add_norm_layer:
            # own the second layer's params so both the fused kernel and
            # the XLA path share them
            h2 = self.nn_sizes[1]
            w2 = self.param(
                "out_kernel",
                nn.initializers.lecun_normal(),
                (h0, h2),
            )
            b2 = self.param("out_bias", nn.initializers.zeros, (h2,))
            if self.dtype is not None:
                w2c = w2.astype(self.dtype)
                b2c = b2.astype(self.dtype)
            else:
                w2c, b2c = w2, b2
            if self._use_fused_knn(x.shape[1], mask):
                from graphnet_tpu.ops.edgeconv_pallas import (
                    fused_edgeconv_knn,
                )

                slope = 0.01 if self.activation == "leaky_relu" else 0.0
                lo, hi = self.knn_subset
                return fused_edgeconv_knn(
                    a, b, idx, edge_mask, mask, w2c, b2c,
                    self.aggr, slope, self.knn_k, lo, hi,
                )
            if self._use_fused(x.shape[1]):
                from graphnet_tpu.ops.edgeconv_pallas import (
                    fused_edgeconv,
                )

                slope = 0.01 if self.activation == "leaky_relu" else 0.0
                out = fused_edgeconv(
                    a, b, idx, edge_mask, w2c, b2c, 128,
                    "add" if self.aggr == "mean" else self.aggr, slope,
                )
                if self.aggr == "mean":
                    n = jnp.sum(edge_mask, axis=2)[..., None]
                    out = out / jnp.maximum(n, 1).astype(out.dtype)
                return out
            msgs = act(a[:, :, None, :] + gather_neighbors(b, idx))
            msgs = act(
                jnp.einsum(
                    "blkh,ho->blko", msgs, w2c,
                    preferred_element_type=(
                        self.dtype or jnp.float32
                    ),
                )
                + b2c
            )
            return constrain_out(
                edge_reduce(
                    msgs.astype(jnp.float32), edge_mask, self.aggr
                )
            )

        msgs = a[:, :, None, :] + gather_neighbors(b, idx)
        if self.add_norm_layer:
            msgs = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name="norm_0"
            )(msgs)
        msgs = act(msgs)
        if len(self.nn_sizes) > 1:
            msgs = MLP(
                self.nn_sizes[1:],
                activation=self.activation,
                add_norm_layer=self.add_norm_layer,
                dtype=self.dtype,
                name="nn",
            )(msgs)
        # reduce in fp32 regardless of compute dtype (sum accuracy)
        return constrain_out(
            edge_reduce(
                msgs.astype(jnp.float32), edge_mask, self.aggr
            )
        )


class DynEdgeConv(nn.Module):
    """EdgeConv followed by kNN recomputation on the new latents.

    Mirror of reference ``DynEdgeConv`` (``layers.py:20-69``): the returned
    ``(x, idx, edge_mask)`` carries the *recomputed* adjacency used by the
    next layer.
    """

    nn_sizes: Sequence[int]
    aggr: str = "add"
    nb_neighbors: int = 8
    features_subset: Tuple[int, ...] = (0, 1, 2)
    activation: str = "relu"
    add_norm_layer: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        idx: jax.Array,
        edge_mask: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        # contiguous feature subsets ride the fused EdgeConv+kNN kernel
        # (the recomputed adjacency comes out of the conv kernel itself)
        fs = tuple(self.features_subset)
        contiguous = fs == tuple(range(fs[0], fs[0] + len(fs)))
        res = EdgeConv(
            self.nn_sizes,
            aggr=self.aggr,
            activation=self.activation,
            add_norm_layer=self.add_norm_layer,
            dtype=self.dtype,
            knn_k=self.nb_neighbors if contiguous else 0,
            knn_subset=(fs[0], fs[0] + len(fs)) if contiguous else None,
            name="conv",
        )(x, idx, edge_mask, mask=mask)
        if isinstance(res, tuple):
            return res
        x = res
        coords = x[..., list(self.features_subset)]
        new_idx, new_edge_mask = knn_graph(coords, mask, k=self.nb_neighbors)
        return x, new_idx, new_edge_mask


class MultiHeadAttention(nn.Module):
    """Standard masked MHA (replaces cuDNN ``nn.MultiheadAttention``).

    Matches torch defaults: combined QKV projection, output projection, both
    with bias; scaled dot-product attention with key-padding mask.
    ``dropout_rate`` is torch's attention-probability dropout
    (``nn.MultiheadAttention(dropout=...)``); active only with
    ``deterministic=False``.
    """

    num_heads: int
    dropout_rate: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        attn_bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, L, D = x.shape
        H = self.num_heads
        assert D % H == 0, f"embed dim {D} not divisible by heads {H}"
        hd = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        # long sequences without a bias term: Pallas flash attention —
        # the [B,H,L,L] logits tensor never touches HBM
        # (ops/flash_attention.py; docs/architecture.md §5)
        from graphnet_tpu.ops.flash_attention import (
            flash_attention,
            supported,
        )

        use_attn_dropout = (
            self.dropout_rate > 0.0 and not self.deterministic
        )
        if (
            attn_bias is None
            and not use_attn_dropout  # flash path has no prob-dropout
            and supported(L, hd)
        ):
            # q/k/v stay at the compute dtype — the kernel runs the MXU
            # natively (bf16) with fp32 softmax statistics
            out = flash_attention(q, k, v, key_padding_mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
            if self.dtype is not None:
                out = out.astype(self.dtype)
            return nn.Dense(D, dtype=self.dtype, name="out")(out)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        if attn_bias is not None:
            logits = logits + attn_bias
        if key_padding_mask is not None:
            # True = valid. Mask out padded keys with -inf before softmax.
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(
                key_padding_mask[:, None, None, :], logits, neg
            )
        attn = jax.nn.softmax(logits, axis=-1)
        if self.dropout_rate > 0.0:
            attn = nn.Dropout(
                self.dropout_rate, deterministic=self.deterministic
            )(attn)
        if self.dtype is not None:
            # softmax stays fp32 for accuracy; cast the weights back so the
            # value matmul runs at the compute dtype (bf16 MXU path)
            attn = attn.astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype, name="out")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm torch-style encoder layer (``norm_first=False``):
    ``x = norm1(x + MHA(x)); x = norm2(x + FFN(x))`` with ReLU FFN.

    Matches ``torch.nn.TransformerEncoderLayer`` defaults used by DynTrans
    (reference ``layers.py:169-177``): dim_feedforward=2048, relu.
    ``dropout_rate`` mirrors torch's residual/FFN dropout (torch default
    0.1; here default 0.0 = the reference's *eval* behaviour — set > 0 and
    ``deterministic=False`` for training-time regularisation).
    """

    num_heads: int
    dim_feedforward: int = 2048
    activation: str = "relu"
    norm_first: bool = False
    dropout_rate: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, key_padding_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        act = resolve_activation(self.activation)
        D = x.shape[-1]

        def drop(h):
            if self.dropout_rate == 0.0:
                return h
            return nn.Dropout(
                self.dropout_rate, deterministic=self.deterministic
            )(h)

        if self.norm_first:
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
            x = x + drop(
                MultiHeadAttention(
                    self.num_heads,
                    dropout_rate=self.dropout_rate,
                    deterministic=self.deterministic,
                    dtype=self.dtype,
                    name="mha",
                )(h, key_padding_mask)
            )
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
            h = nn.Dense(
                self.dim_feedforward, dtype=self.dtype, name="linear1"
            )(h)
            h = nn.Dense(D, dtype=self.dtype, name="linear2")(
                drop(act(h))
            )
            return x + drop(h)
        h = MultiHeadAttention(
            self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=self.deterministic,
            dtype=self.dtype,
            name="mha",
        )(x, key_padding_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(h))
        h = nn.Dense(
            self.dim_feedforward, dtype=self.dtype, name="linear1"
        )(x)
        h = nn.Dense(D, dtype=self.dtype, name="linear2")(drop(act(h)))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(h))


class DynTrans(nn.Module):
    """TITO block: EdgeConvTito (+residual) → LayerNorm → 1-layer transformer.

    Mirror of reference ``DynTrans`` (``layers.py:117-197``).  In the dense
    layout the reference's ``to_dense_batch`` round-trip disappears — data is
    already ``[B, L, D]``; the key-padding mask is the node mask.  Unlike
    DynEdgeConv this does NOT recompute the kNN graph.
    """

    layer_sizes: Sequence[int] = (256, 256, 256)
    aggr: str = "max"
    n_head: int = 8
    dropout_rate: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        idx: jax.Array,
        edge_mask: jax.Array,
    ) -> jax.Array:
        sizes = list(self.layer_sizes)[1:]
        x_out = EdgeConv(
            sizes,
            aggr=self.aggr,
            activation="leaky_relu",
            tito=True,
            dtype=self.dtype,
            name="conv",
        )(x, idx, edge_mask)
        if x_out.shape[-1] == x.shape[-1]:
            x = x + x_out
        else:
            x = x_out
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = TransformerEncoderLayer(
            self.n_head,
            dropout_rate=self.dropout_rate,
            deterministic=self.deterministic,
            dtype=self.dtype,
            name="transformer",
        )(x, key_padding_mask=mask)
        return x.astype(jnp.float32)


class DropPath(nn.Module):
    """Stochastic depth (reference ``layers.py:200-230``)."""

    drop_prob: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.deterministic or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """Two-layer GELU MLP used by transformer blocks
    (reference ``layers.py:232-273``)."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: str = "gelu"
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        D = x.shape[-1]
        hidden = self.hidden_features or D
        out = self.out_features or D
        act = resolve_activation(self.activation)
        x = act(nn.Dense(hidden, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=self.deterministic)(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=self.deterministic)(x)
        return x


class AttentionRel(nn.Module):
    """BEiTv2-style attention with relative spacetime features.

    Mirror of reference ``Attention_rel`` (``layers.py:389-499``):
    ``rel_pos_bias`` is a per-pair feature tensor ``[B, L, L, head_dim]``
    acting as a relative *key* (contracted against the scaled query into the
    logits) and relative *value* (attention-weighted into the output).
    q/v have bias (when ``qkv_bias``), k never does.
    """

    num_heads: int = 8
    qkv_bias: bool = False
    # >1: rebuild the relative-position features per query tile from a
    # ``rel_source=(encoder, x0)`` pair instead of consuming a
    # materialised [B, L, L, hd] tensor — O(L²·hd) memory becomes
    # O(L²·hd / rel_chunks) peak (long-L DeepIce)
    rel_chunks: int = 1
    # use the Pallas streaming rel-bias kernel for the biased path when
    # the shape qualifies (requires ``rel_source``): "never", "always",
    # or "auto" (TPU backend AND the chunked path's O(L^2) buffers
    # would not fit HBM — see :meth:`rel_flash_auto`).  Measured
    # negative results (tools/ablate_deepice.py, 2026-08-20): on SPEED
    # the XLA chunked-dense path wins wherever it fits — full train
    # step 112.7 vs 157.3 ms at B=16 L=768, 170.0 vs 260.5 ms at B=8
    # L=1536 — because the kernel recomputes the pair-embedding
    # transcendentals per head-group in fwd AND bwd while the dense
    # einsums ride the MXU.  The kernel's value is MEMORY: at B=8
    # L=3072 the chunked path OOMs v5e HBM (>=20 x 432 MB bwd temps
    # even after XLA remat) while the streaming kernel trains at
    # 893 ms/step — the only way to run that shape on one chip.
    rel_flash: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @staticmethod
    def rel_flash_auto(B: int, H: int, L: int) -> bool:
        """True when the chunked-dense biased path would exhaust HBM:
        one bf16 [B, H, L, L] attention plane > ~600 MB (the backward
        holds tens of such temps; measured fits at 452 MB/plane —
        B=8 L=1536 — and OOMs at 1.8 GB/plane — B=8 L=3072)."""
        return B * H * L * L * 2 > 600e6

    @nn.compact
    def __call__(
        self,
        q_in: jax.Array,
        k_in: jax.Array,
        v_in: jax.Array,
        rel_pos_bias: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
        rel_source=None,
    ) -> jax.Array:
        B, L, D = q_in.shape
        H = self.num_heads
        hd = D // H
        scale = hd ** -0.5
        q = nn.Dense(
            D, use_bias=self.qkv_bias, dtype=self.dtype, name="proj_q"
        )(q_in)
        k = nn.Dense(
            D, use_bias=False, dtype=self.dtype, name="proj_k"
        )(k_in)
        v = nn.Dense(
            D, use_bias=self.qkv_bias, dtype=self.dtype, name="proj_v"
        )(v_in)

        def heads(t):
            return t.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q) * scale, heads(k), heads(v)

        if rel_source is not None and rel_pos_bias is None:
            from graphnet_tpu.ops.rel_flash_attention import (
                rel_flash_supported,
            )

            use_flash = self.rel_flash == "always" or (
                self.rel_flash == "auto"
                and jax.default_backend() == "tpu"
                and self.rel_flash_auto(B, H, L)
            )
            # the kernel's rel-value fold requires pair-feature dim ==
            # head dim (true for DeepIce: SpacetimeEncoder(head_size))
            if (
                use_flash
                and rel_flash_supported(L, hd)
                and getattr(rel_source[0], "seq_length", None) == hd
            ):
                return self._flash_rel(
                    q, k, v, rel_source, key_padding_mask, B, L, D
                )
            return self._chunked_rel(
                q, k, v, rel_source, key_padding_mask, B, L, D, H, hd
            )

        if rel_pos_bias is not None and self.rel_chunks > 1:
            # cached-bias chunked path (r5): the pair tensor was
            # materialised ONCE by the caller (bf16 HBM) and is
            # STREAMED per query tile — the O(L²) logits/attn planes
            # never exist whole, and the backward re-reads the cache
            # instead of recomputing ~L²·d sin/cos transcendentals
            # (the chunked-rebuild path pays those in fwd AND bwd)
            return self._chunked_rel(
                q, k, v, None, key_padding_mask, B, L, D, H, hd,
                rel_cached=rel_pos_bias,
            )

        # DeepIce applies the spacetime bias only to the first n_rel
        # block (`gnn/icemix.py`); the remaining rel-blocks are plain
        # masked attention — flash-eligible at long L
        from graphnet_tpu.ops.flash_attention import (
            flash_attention,
            supported,
        )

        if rel_pos_bias is None and supported(q.shape[2], hd):
            out = flash_attention(
                q, k, v, key_padding_mask, scale=1.0
            )  # q already carries the 1/sqrt(hd) scale
            out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
            if self.dtype is not None:
                out = out.astype(self.dtype)
            return nn.Dense(D, dtype=self.dtype, name="proj")(out)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if rel_pos_bias is not None:
            # relative-key term: contract scaled query with pair features
            logits = logits + jnp.einsum(
                "bhic,bijc->bhij", q, rel_pos_bias,
                preferred_element_type=jnp.float32,
            )
        if key_padding_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(
                key_padding_mask[:, None, None, :], logits, neg
            )
        attn = jax.nn.softmax(logits, axis=-1)
        if self.dtype is not None:
            # softmax stats stay fp32; the attention-weight matmuls run
            # at the compute dtype (bf16 MXU path)
            attn = attn.astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3)  # [B, L, H, hd]
        if rel_pos_bias is not None:
            # relative-value term
            out = out + jnp.einsum(
                "bhij,bijc->bihc", attn, rel_pos_bias,
                preferred_element_type=jnp.float32,
            ).astype(out.dtype)
        out = out.reshape(B, L, D)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)

    def _flash_rel(
        self, q, k, v, rel_source, key_padding_mask, B, L, D
    ) -> jax.Array:
        """Streaming Pallas rel-bias attention: the pair embedding never
        touches HBM (rebuilt per VMEM tile from the O(L) coordinates).
        Exact same math as the materialised path; differentiable via the
        kernel's recompute custom VJP."""
        from graphnet_tpu.ops.rel_flash_attention import (
            rel_flash_attention,
            rel_flash_tiles,
        )

        encoder, x0 = rel_source
        # creating the (shared) SpacetimeEncoder params requires one
        # call; a 1-pair slice is free and DCE'd in apply
        _ = encoder(x0[:, :1], x0[:, :1])
        enc_params = encoder.variables["params"]["projection"]
        w, b = enc_params["kernel"], enc_params["bias"]
        tq, ts = rel_flash_tiles(L)
        out = rel_flash_attention(
            q, k, v, x0, w.astype(jnp.float32), b.astype(jnp.float32),
            key_padding_mask=key_padding_mask, tq=tq, ts=ts,
            # "always" off-TPU (tests) runs the kernel in interpret mode
            interpret=jax.default_backend() != "tpu",
        )  # [B, L, H, hd] fp32
        out = out.reshape(B, L, D)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)

    def _chunked_rel(
        self,
        q,
        k,
        v,
        rel_source,
        key_padding_mask,
        B,
        L,
        D,
        H,
        hd,
        rel_cached=None,
    ) -> jax.Array:
        """Biased attention per query tile.  The rel features for a tile
        come either from ``rel_cached`` (a pair tensor materialised once
        by the caller — sliced, never recomputed) or are rebuilt from
        ``rel_source`` (shared SpacetimeEncoder module — params stay
        under its original scope).  Exact same math as the materialised
        dense path either way."""
        n = max(1, min(self.rel_chunks, L))
        tq = -(-L // n)  # ceil
        neg = jnp.finfo(jnp.float32).min
        outs = []
        for s in range(0, L, tq):
            e = min(s + tq, L)
            if rel_cached is not None:
                rel = rel_cached[:, s:e]  # [B, tq, L, hd] view
            else:
                encoder, x0 = rel_source
                rel = encoder(x0, x0[:, s:e])  # [B, tq, L, hd]
            qc = q[:, :, s:e]  # [B, H, tq, hd] (scaled)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qc, k,
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bhic,bijc->bhij", qc, rel,
                preferred_element_type=jnp.float32,
            )
            if key_padding_mask is not None:
                logits = jnp.where(
                    key_padding_mask[:, None, None, :], logits, neg
                )
            attn = jax.nn.softmax(logits, axis=-1)
            if self.dtype is not None:
                attn = attn.astype(self.dtype)
            oc = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            oc = oc.transpose(0, 2, 1, 3)  # [B, tq, H, hd]
            oc = oc + jnp.einsum(
                "bhij,bijc->bihc", attn, rel,
                preferred_element_type=jnp.float32,
            ).astype(oc.dtype)
            outs.append(oc)
        out = jnp.concatenate(outs, axis=1).reshape(B, L, D)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class BlockRel(nn.Module):
    """Pre-norm transformer block with relative attention + optional
    layer-scale γ (reference ``Block_rel``, ``layers.py:276-386``)."""

    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    deterministic: bool = True
    rel_chunks: int = 1
    rel_flash: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rel_pos_bias: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
        rel_source=None,
    ) -> jax.Array:
        D = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = AttentionRel(
            self.num_heads,
            qkv_bias=True,
            rel_chunks=self.rel_chunks,
            rel_flash=self.rel_flash,
            dtype=self.dtype,
            name="attn",
        )(
            h, h, h, rel_pos_bias=rel_pos_bias,
            key_padding_mask=key_padding_mask,
            rel_source=rel_source,
        )
        if self.init_values is not None:
            gamma1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (D,)
            )
            h = gamma1.astype(h.dtype) * h
        x = x + DropPath(self.drop_path, self.deterministic, name="dp1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            hidden_features=int(D * self.mlp_ratio),
            deterministic=self.deterministic,
            dtype=self.dtype,
            name="mlp",
        )(h)
        if self.init_values is not None:
            gamma2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (D,)
            )
            h = gamma2.astype(h.dtype) * h
        return x + DropPath(self.drop_path, self.deterministic, name="dp2")(h)


class Block(nn.Module):
    """Standard pre-norm MHA block with optional layer-scale
    (reference ``Block``, ``layers.py:502-596``)."""

    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        D = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = MultiHeadAttention(
            self.num_heads, dtype=self.dtype, name="attn"
        )(h, key_padding_mask=key_padding_mask)
        if self.init_values is not None:
            gamma1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (D,)
            )
            h = gamma1.astype(h.dtype) * h
        x = x + DropPath(self.drop_path, self.deterministic, name="dp1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            hidden_features=int(D * self.mlp_ratio),
            deterministic=self.deterministic,
            dtype=self.dtype,
            name="mlp",
        )(h)
        if self.init_values is not None:
            gamma2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (D,)
            )
            h = gamma2.astype(h.dtype) * h
        return x + DropPath(self.drop_path, self.deterministic, name="dp2")(h)
