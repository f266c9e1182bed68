"""ISeeCube — pure-transformer backbone (mirror of reference
``src/graphnet/models/transformer/iseecube.py:20-102``, after
github.com/ChenLi2049/ISeeCube).

The reference delegates to torchscale's ``Encoder`` (optional dependency):
a Magneto-style pre-LN transformer (``subln=True``: an extra LayerNorm on
the attention output before the out-projection and one between the FFN
activation and fc2) with a T5-style bucketed relative-position bias shared
across all layers, and a final encoder LayerNorm — followed by ISeeCube's
OWN LayerNorm (two consecutive norms, as in the reference composition).
Here that encoder is implemented natively with the same structure;
executed-reference parity runs the reference's ``iseecube.py`` from disk
against the ``tests/refshim/_torchscale.py`` transcription
(``tests/test_reference_parity_exec.py::test_iseecube_activation_parity``).
Unlike the reference (which passes no padding mask into torchscale),
padded keys are masked — parity tests use full-length events where the
mask is a no-op.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.components.embedding import FourierEncoder
from graphnet_tpu.models.components.layers import Block
from graphnet_tpu.models.gnn.gnn import GNN


def t5_relative_buckets(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """T5 bidirectional relative-position bucketing."""
    num_buckets //= 2
    ret = jnp.where(relative_position > 0, num_buckets, 0)
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    num_buckets: int = 32
    max_distance: int = 256
    num_heads: int = 12

    @nn.compact
    def __call__(self, T: int) -> jax.Array:
        """Additive attention bias [1, H, T, T]."""
        table = self.param(
            "rel_embedding",
            nn.initializers.normal(0.02),
            (self.num_buckets, self.num_heads),
        )
        pos = jnp.arange(T)
        rel = pos[None, :] - pos[:, None]
        buckets = t5_relative_buckets(
            rel, self.num_buckets, self.max_distance
        )
        bias = table[buckets]  # [T, T, H]
        return bias.transpose(2, 0, 1)[None]


class ISeeCube(GNN):
    hidden_dim: int = 384
    seq_length: int = 196
    num_layers: int = 16
    num_heads: int = 12
    mlp_dim: int = 1536
    rel_pos_buckets: int = 32
    max_rel_pos: int = 256
    num_register_tokens: int = 3
    scaled_emb: bool = False
    n_features: int = 6

    @property
    def nb_outputs(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, batch: EventBatch) -> jax.Array:
        x0, mask = batch.x, batch.mask
        B, L, _ = x0.shape
        assert L <= self.seq_length, (
            f"events padded to {L} > seq_length {self.seq_length}"
        )
        x = FourierEncoder(
            seq_length=self.seq_length,
            mlp_dim=self.mlp_dim,
            output_dim=self.hidden_dim,
            scaled=self.scaled_emb,
            n_features=self.n_features,
            name="fourier_ext",
        )(x0, batch.n_pulses)

        pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        x = x + pos_embedding[:, :L]

        class_token = self.param(
            "class_token",
            nn.initializers.normal(0.02),
            (1, 1, self.hidden_dim),
        )
        register_tokens = self.param(
            "register_tokens",
            nn.initializers.normal(0.02),
            (1, self.num_register_tokens, self.hidden_dim),
        )
        n_special = 1 + self.num_register_tokens
        x = jnp.concatenate(
            [
                jnp.broadcast_to(
                    class_token, (B, 1, self.hidden_dim)
                ),
                jnp.broadcast_to(
                    register_tokens,
                    (B, self.num_register_tokens, self.hidden_dim),
                ),
                x,
            ],
            axis=1,
        )
        full_mask = jnp.concatenate(
            [jnp.ones((B, n_special), bool), mask], axis=1
        )

        T = x.shape[1]
        rel_bias = RelativePositionBias(
            self.rel_pos_buckets,
            self.max_rel_pos,
            self.num_heads,
            name="rel_pos_bias",
        )(T)

        from graphnet_tpu.ops.gelu import gelu_exact

        for i in range(self.num_layers):
            # pre-norm Magneto block, shared additive rel-pos bias in
            # every layer (torchscale Encoder behaviour, subln=True)
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x)
            h = _BiasedMHA(
                self.num_heads, name=f"attn_{i}"
            )(h, rel_bias, full_mask)
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x)
            h = nn.Dense(self.mlp_dim, name=f"fc1_{i}")(h)
            h = gelu_exact(h)  # torchscale uses F.gelu (exact erf)
            # Magneto ffn_layernorm between activation and fc2
            h = nn.LayerNorm(epsilon=1e-5, name=f"ffn_ln_{i}")(h)
            h = nn.Dense(self.hidden_dim, name=f"fc2_{i}")(h)
            x = x + h

        # torchscale's encoder-final LayerNorm, then ISeeCube's own —
        # the reference applies BOTH (iseecube.py:84,100-102)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        return x[:, 0]


class _BiasedMHA(nn.Module):
    """torchscale ``MultiheadAttention`` (self-attention, subln=True):
    separate biased q/k/v projections, fp32 softmax, Magneto
    ``inner_attn_ln`` on the attention output before the
    out-projection.  Sharded by name under tensor parallelism
    (proj_q/proj_k/proj_v column, out row —
    ``parallel/tensor_parallel.py``)."""

    num_heads: int

    @nn.compact
    def __call__(self, x, attn_bias, key_padding_mask):
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, name="proj_q")(x)
        k = nn.Dense(D, name="proj_k")(x)
        v = nn.Dense(D, name="proj_v")(x)

        def heads(t):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        logits = logits + attn_bias
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(
            key_padding_mask[:, None, None, :], logits, neg
        )
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.LayerNorm(epsilon=1e-5, name="inner_attn_ln")(out)
        return nn.Dense(D, name="out")(out)
