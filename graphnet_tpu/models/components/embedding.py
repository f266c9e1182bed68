"""Input embeddings for the DeepIce/IceMix transformer family (mirror of
reference ``src/graphnet/models/components/embedding.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class SinusoidalPosEmb(nn.Module):
    """Fourier features: ``[sin(x w_i), cos(x w_i)]`` with geometric
    frequencies (reference ``embedding.py:11-50``)."""

    dim: int = 16
    n_freq: float = 10000.0
    scaled: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.dim % 2 == 0, f"dim must be even, got {self.dim}"
        half = self.dim // 2
        # match torch bit-for-bit: log(n_freq) is rounded to fp32 BEFORE
        # the divide (`embedding.py:46-47`); the 1-ulp frequency difference
        # is amplified ~4096x by the FourierEncoder's scaled arguments
        log_nf = np.float32(np.log(np.float32(self.n_freq)))
        freq = jnp.exp(
            jnp.arange(half, dtype=jnp.float32)
            * jnp.float32(-log_nf / np.float32(half))
        )
        emb = x[..., None] * freq
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        if self.scaled:
            scale = self.param(
                "scale",
                nn.initializers.constant(self.dim ** -0.5),
                (1,),
            )
            emb = emb * scale
        return emb


class FourierEncoder(nn.Module):
    """Per-pulse embedding: sin-emb of 4096*xyz, 1024*charge, 4096*time,
    auxiliary embedding table, log10(seq_length) emb → MLP
    (reference ``embedding.py:53-136``).

    Input x is ``[B, L, n_features]`` with feature order
    (x, y, z, time, charge, auxiliary, ...).
    """

    seq_length: int = 128
    mlp_dim: Optional[int] = None
    output_dim: int = 384
    scaled: bool = False
    n_features: int = 6
    # compute dtype for the MLP matmuls only — the sinusoidal features
    # and LayerNorm statistics stay fp32 (their precision is what the
    # executed-reference parity tests pin down)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, seq_lengths: Array) -> Array:
        assert self.n_features >= 4, "x, y, z, time required"
        B, L, _ = x.shape
        sin_emb = SinusoidalPosEmb(
            dim=self.seq_length, scaled=self.scaled, name="sin_emb"
        )
        sin_emb2 = SinusoidalPosEmb(
            dim=self.seq_length // 2, scaled=self.scaled, name="sin_emb2"
        )

        embeddings = [
            sin_emb(4096.0 * x[:, :, :3]).reshape(B, L, -1)  # position
        ]
        if self.n_features >= 5:
            embeddings.append(sin_emb(1024.0 * x[:, :, 4]))  # charge
        embeddings.append(sin_emb(4096.0 * x[:, :, 3]))  # time
        if self.n_features >= 6:
            aux = nn.Embed(2, self.seq_length // 2, name="aux_emb")(
                jnp.clip(x[:, :, 5].astype(jnp.int32), 0, 1)
            )
            embeddings.append(aux)
            hidden_dim = 6 * self.seq_length
        else:
            hidden_dim = int((self.n_features + 0.5) * self.seq_length)

        length = jnp.log10(
            jnp.maximum(seq_lengths, 1).astype(jnp.float32)
        )
        len_emb = sin_emb2(length)[:, None, :]
        embeddings.append(jnp.broadcast_to(len_emb, (B, L, len_emb.shape[-1])))

        h = jnp.concatenate(embeddings, axis=-1)
        mlp_dim = self.mlp_dim or hidden_dim
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="mlp_0")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(h)
        from graphnet_tpu.ops.gelu import gelu_exact

        h = gelu_exact(h)  # torch nn.GELU is exact-erf (recompute VJP)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="mlp_1")(h)


class SpacetimeEncoder(nn.Module):
    """Pairwise signed sqrt spacetime interval → sin-emb → linear, produces
    the relative-position features ``[B, L, L, seq_length]`` consumed by
    ``AttentionRel`` (reference ``embedding.py:139-175``)."""

    seq_length: int = 32
    # compute dtype for the projection; also halves the HBM footprint of
    # the materialised [B, L, L, seq_length] pair tensor under bf16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, x_query: Optional[Array] = None) -> Array:
        """Pair features between ``x_query`` (default: all of ``x``) and
        ``x``: ``[B, Lq, L, seq_length]``.  Passing a query *slice* lets
        long-L attention rebuild the bias tile-by-tile instead of
        materialising the O(L²·d) tensor (``AttentionRel`` chunked path).
        """
        if x_query is None:
            x_query = x
        pos_q, time_q = x_query[:, :, :3], x_query[:, :, 3]
        pos, time = x[:, :, :3], x[:, :, 3]
        c = 3e4 / 500 * 3e-1  # light speed in the scaled units
        interval = jnp.sum(
            (pos_q[:, :, None] - pos[:, None, :]) ** 2, axis=-1
        ) - ((time_q[:, :, None] - time[:, None, :]) * c) ** 2
        four_distance = jnp.sign(interval) * jnp.sqrt(jnp.abs(interval))
        emb = SinusoidalPosEmb(dim=self.seq_length, name="sin_emb")(
            1024.0 * jnp.clip(four_distance, -4.0, 4.0)
        )
        return nn.Dense(
            self.seq_length, dtype=self.dtype, name="projection"
        )(emb)
