"""DeepIce (IceMix) — Kaggle 2nd-place transformer (mirror of reference
``src/graphnet/models/gnn/icemix.py:31-167``, arXiv:2310.15674).

FourierEncoder + SpacetimeEncoder relative features → ``depth_rel``
BlockRel layers (rel features used in the first ``n_rel``) → cls token →
``depth`` standard Blocks with layer-scale.  The reference's
``array_to_sequence`` padding is a no-op here — the batch is already dense.
Optionally concatenates DynEdge node latents (``include_dynedge``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.components.embedding import (
    FourierEncoder,
    SpacetimeEncoder,
)
from graphnet_tpu.models.components.layers import Block, BlockRel
from graphnet_tpu.models.gnn.dynedge import DynEdge
from graphnet_tpu.models.gnn.gnn import GNN


class DeepIce(GNN):
    hidden_dim: int = 384
    mlp_ratio: int = 4
    seq_length: int = 192
    depth: int = 12
    head_size: int = 32
    depth_rel: int = 4
    n_rel: int = 1
    scaled_emb: bool = False
    include_dynedge: bool = False
    dynedge_args: Optional[Dict[str, Any]] = None
    n_features: int = 6
    # >1: process the spacetime rel-bias per query tile inside attention
    # instead of materialising the full [B, H, L, L] logits at once —
    # peak memory of the bias path drops by this factor (use for
    # L >= ~1024)
    rel_bias_chunks: int = 1
    # cache the SpacetimeEncoder pair tensor in HBM (bf16 under
    # compute_dtype) ONCE per forward and stream slices into the
    # chunked biased blocks, instead of recomputing the ~L²·d sin/cos
    # embedding per tile in fwd AND bwd (the reference computes it
    # once too, ``icemix.py:137``).  "auto": engage when the cached
    # tensor is <= ~700 MB (B=16 L=768 bf16 = 302 MB fits; B=8 L=1536
    # = 1.2 GB does not — the bwd d(pair) temp doubles it); "always";
    # "never" (always rebuild per tile).  Irrelevant when
    # rel_bias_chunks == 1 (dense path already materialises once) or
    # when the Pallas rel-flash kernel engages (nothing materialises).
    rel_bias_cache: str = "auto"
    # Pallas streaming rel-bias kernel (ops/rel_flash_attention.py):
    # "auto" = TPU backend AND L >= 1536 (below that the XLA chunked-
    # dense path is faster — measured, see AttentionRel); "always";
    # "never".  The kernel's win is memory: the O(L^2*e) pair tensor
    # never touches HBM, which is what long-L DeepIce needs
    rel_flash: str = "auto"
    # "bfloat16" runs every transformer matmul (qkv/proj/MLP/Fourier-MLP
    # and the attention-weight products) at bf16 with fp32 softmax and
    # LayerNorm statistics; None = fp32 throughout (the parity default)
    compute_dtype: Optional[str] = None
    # rematerialise the transformer blocks in the backward pass
    # (jax.checkpoint per block): residual memory drops from every
    # intermediate of all 16 blocks to one [B, L, D] tensor per block,
    # trading one extra forward's FLOPs.  Unlocks larger batch/L on a
    # single chip (B=32 at L=768 OOM'd v5e HBM by 3% without it).  The
    # rel-bias block (i < n_rel) is never rematted: its call threads the
    # SpacetimeEncoder module through, which jax.checkpoint cannot trace.
    remat: bool = False

    @property
    def nb_outputs(self) -> int:
        return self.hidden_dim

    @nn.compact
    def __call__(self, batch: EventBatch) -> jax.Array:
        x0, mask = batch.x, batch.mask
        B, L, _ = x0.shape
        cdtype = self._resolved_compute_dtype()

        fourier_out = (
            self.hidden_dim // 2
            if self.include_dynedge
            else self.hidden_dim
        )
        x = FourierEncoder(
            seq_length=self.seq_length,
            output_dim=fourier_out,
            scaled=self.scaled_emb,
            n_features=self.n_features,
            dtype=cdtype,
            name="fourier_ext",
        )(x0, batch.n_pulses)
        rel_encoder = SpacetimeEncoder(
            self.head_size, dtype=cdtype, name="rel_pos"
        )
        from graphnet_tpu.ops.rel_flash_attention import (
            rel_flash_supported,
        )

        from graphnet_tpu.models.components.layers import AttentionRel

        flash_ok = (
            self.rel_flash == "always"
            or (
                self.rel_flash == "auto"
                and jax.default_backend() == "tpu"
                and AttentionRel.rel_flash_auto(
                    B, self.hidden_dim // self.head_size, L
                )
            )
        ) and rel_flash_supported(L, self.head_size)
        cache_bytes = (
            x0.shape[0]
            * L
            * L
            * self.head_size
            * (2 if cdtype == jnp.bfloat16 else 4)
        )
        use_cache = (
            not flash_ok
            and self.rel_bias_chunks > 1
            and (
                self.rel_bias_cache == "always"
                or (
                    self.rel_bias_cache == "auto"
                    and cache_bytes <= 700e6
                )
            )
        )
        if flash_ok or (self.rel_bias_chunks > 1 and not use_cache):
            rel_pos_bias = None
            rel_source = (rel_encoder, x0)
        else:
            # materialised ONCE (bf16 under compute_dtype) and shared
            # by every biased block — chunked attention slices it
            rel_pos_bias = rel_encoder(x0)
            rel_source = None

        if self.include_dynedge:
            args = self.dynedge_args or dict(
                nb_inputs=self.n_features,
                nb_neighbours=9,
                post_processing_layer_sizes=(336, self.hidden_dim // 2),
                dynedge_layer_sizes=(
                    (128, 256),
                    (336, 256),
                    (336, 256),
                    (336, 256),
                ),
                global_pooling_schemes=None,
                activation_layer="gelu",
                add_norm_layer=True,
                skip_readout=True,
            )
            args = dict(args)
            args.setdefault("compute_dtype", self.compute_dtype)
            node_latents = DynEdge(**args, name="dyn_edge")(batch)
            x = jnp.concatenate(
                [x, node_latents.astype(x.dtype)], axis=2
            )

        num_heads = self.hidden_dim // self.head_size
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth_rel):
            # exactly one of rel_pos_bias / rel_source is always set
            # (chosen above), so block i is biased iff i < n_rel
            has_rel = i < self.n_rel
            # bias-free sandwich blocks are safe to remat (array args only)
            rel_cls = (
                nn.remat(BlockRel)
                if (self.remat and not has_rel)
                else BlockRel
            )
            x = rel_cls(
                num_heads=num_heads,
                rel_chunks=self.rel_bias_chunks,
                rel_flash=self.rel_flash,
                dtype=cdtype,
                name=f"sandwich_{i}",
            )(
                x,
                rel_pos_bias=(
                    rel_pos_bias if i < self.n_rel else None
                ),
                key_padding_mask=mask,
                rel_source=(
                    rel_source if i < self.n_rel else None
                ),
            )

        # learned cls token (a bias-free Linear's weight in the reference,
        # icemix.py:86; here a plain parameter of the same shape)
        cls_token = self.param(
            "cls_token",
            nn.initializers.lecun_normal(),
            (1, self.hidden_dim),
        )
        cls = jnp.broadcast_to(
            cls_token[None, :, :], (B, 1, self.hidden_dim)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        full_mask = jnp.concatenate(
            [jnp.ones((B, 1), bool), mask], axis=1
        )

        for i in range(self.depth):
            x = block_cls(
                num_heads=num_heads,
                mlp_ratio=float(self.mlp_ratio),
                init_values=1.0,
                dtype=cdtype,
                name=f"blocks_{i}",
            )(x, key_padding_mask=full_mask)

        # the readout head (task affine) runs fp32
        return x[:, 0].astype(jnp.float32)
