"""Pure-torch shim of ``torchscale`` — exactly the API surface the
reference's ISeeCube uses (``/root/reference/src/graphnet/models/
transformer/iseecube.py:14-16``): ``architecture.config.EncoderConfig``
and ``architecture.encoder.Encoder``.

Transcribed from the PUBLIC torchscale source (github.com/microsoft/
torchscale, ``architecture/encoder.py``, ``architecture/config.py``,
``component/multihead_attention.py``, ``component/feedforward_network.py``,
``component/relative_position_bias.py``) for the non-MoE / non-multiway /
non-deepnorm / non-xpos path that ISeeCube's config reaches.  torchscale
itself is not installable here (no egress), so this transcription is a
second, partially independent reading of the same published code — the
parity test it enables exercises the reference's OWN ``iseecube.py``
composition (token concat order, pos-embedding add, encoder wiring,
double final LayerNorm, cls readout) end to end.

Assumed torchscale defaults, documented because they shape the math
(each verified against the published source at transcription time):

* ``subln=True`` (Magneto sub-LayerNorms: ``inner_attn_ln`` on the
  attention output before ``out_proj``; ``ffn_layernorm`` between the
  activation and ``fc2``),
* ``encoder_normalize_before=True`` (pre-LN blocks; final encoder
  LayerNorm applied after the last block),
* ``no_scale_embedding=True`` (embed scale 1.0),
* ``dropout = attention_dropout = activation_dropout = 0.0``,
* ``activation_fn="gelu"`` (exact erf gelu, computed in fp32),
* softmax in fp32, cast back to the input dtype,
* the T5-style bucketed ``RelativePositionBias`` is computed ONCE per
  forward at the encoder level and added to every layer's logits
  (shared bucket table across layers),
* with ``src_tokens=None`` + ``token_embeddings`` the padding mask is
  all-False (every token attends everywhere) and no positional
  embedding is added inside the encoder (``embed_positions`` is a
  constructor argument that ISeeCube never passes).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn

__refshim__ = True


class EncoderConfig:
    """torchscale ``architecture/config.py::EncoderConfig`` — the fields
    the encoder path reads, with the published defaults."""

    def __init__(self, **kwargs):
        self.encoder_embed_dim = kwargs.pop("encoder_embed_dim", 768)
        self.encoder_attention_heads = kwargs.pop(
            "encoder_attention_heads", 12
        )
        self.encoder_ffn_embed_dim = kwargs.pop(
            "encoder_ffn_embed_dim", 3072
        )
        self.encoder_layers = kwargs.pop("encoder_layers", 12)
        self.encoder_normalize_before = kwargs.pop(
            "encoder_normalize_before", True
        )
        self.normalize_output = kwargs.pop("normalize_output", True)
        self.activation_fn = kwargs.pop("activation_fn", "gelu")
        self.dropout = kwargs.pop("dropout", 0.0)
        self.drop_path_rate = kwargs.pop("drop_path_rate", 0.0)
        self.attention_dropout = kwargs.pop("attention_dropout", 0.0)
        self.activation_dropout = kwargs.pop("activation_dropout", 0.0)
        self.no_scale_embedding = kwargs.pop("no_scale_embedding", True)
        self.layernorm_embedding = kwargs.pop("layernorm_embedding", False)
        self.layernorm_eps = kwargs.pop("layernorm_eps", 1e-5)
        self.rel_pos_buckets = kwargs.pop("rel_pos_buckets", 0)
        self.max_rel_pos = kwargs.pop("max_rel_pos", 0)
        self.deepnorm = kwargs.pop("deepnorm", False)
        self.subln = kwargs.pop("subln", True)
        self.multiway = kwargs.pop("multiway", False)
        self.xpos_rel_pos = kwargs.pop("xpos_rel_pos", False)
        self.bert_init = kwargs.pop("bert_init", False)
        self.vocab_size = kwargs.pop("vocab_size", -1)
        self.no_output_layer = kwargs.pop("no_output_layer", False)
        self.max_source_positions = kwargs.pop(
            "max_source_positions", 1024
        )
        self.checkpoint_activations = kwargs.pop(
            "checkpoint_activations", False
        )
        # published constraint resolution order: deepnorm wins, then
        # subln forces pre-LN
        if self.deepnorm:
            self.encoder_normalize_before = False
            self.subln = False
        if self.subln:
            self.encoder_normalize_before = True
            self.deepnorm = False


def get_activation_fn(activation):
    if activation == "relu":
        return F.relu
    if activation == "gelu":
        return F.gelu
    raise NotImplementedError(activation)


class RelativePositionBias(nn.Module):
    """T5-style bucketed relative-position bias
    (``component/relative_position_bias.py``)."""

    def __init__(
        self,
        bidirectional: bool = True,
        num_buckets: int = 32,
        max_distance: int = 128,
        n_heads: int = 12,
    ):
        super().__init__()
        self.bidirectional = bidirectional
        self.num_buckets = num_buckets
        self.max_distance = max_distance
        self.n_heads = n_heads
        self.relative_attention_bias = nn.Embedding(num_buckets, n_heads)

    @staticmethod
    def _relative_position_bucket(
        relative_position, bidirectional=True, num_buckets=32,
        max_distance=128,
    ):
        ret = 0
        n = -relative_position
        if bidirectional:
            num_buckets //= 2
            ret += (n < 0).to(torch.long) * num_buckets
            n = torch.abs(n)
        else:
            n = torch.max(n, torch.zeros_like(n))
        max_exact = num_buckets // 2
        is_small = n < max_exact
        val_if_large = max_exact + (
            torch.log(n.float() / max_exact)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).to(torch.long)
        val_if_large = torch.min(
            val_if_large, torch.full_like(val_if_large, num_buckets - 1)
        )
        ret += torch.where(is_small, n, val_if_large)
        return ret

    def compute_bias(self, qlen, klen, step=None):
        step = 0 if step is None else step
        context_position = torch.arange(
            step, step + qlen, dtype=torch.long
        )[:, None]
        memory_position = torch.arange(klen, dtype=torch.long)[None, :]
        relative_position = memory_position - context_position
        rp_bucket = self._relative_position_bucket(
            relative_position,
            bidirectional=self.bidirectional,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        values = self.relative_attention_bias(rp_bucket)  # [q, k, H]
        values = values.permute(2, 0, 1).unsqueeze(0)  # [1, H, q, k]
        return values

    def forward(self, batch_size, qlen, klen, step=None):
        # [B * n_heads, qlen, klen] — the layout MultiheadAttention
        # views back onto its [B*H, q, k] logits
        return (
            self.compute_bias(qlen, klen, step)
            .repeat(batch_size, 1, 1, 1)
            .view(-1, qlen, klen)
        )


class MultiheadAttention(nn.Module):
    """``component/multihead_attention.py`` — self-attention path,
    separate q/k/v projections (all biased), q pre-scaled, fp32
    softmax, Magneto ``inner_attn_ln`` under subln."""

    def __init__(
        self,
        args,
        embed_dim,
        num_heads,
        dropout=0.0,
        self_attention=False,
        encoder_decoder_attention=False,
        subln=False,
    ):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scaling = self.head_dim ** -0.5
        self.self_attention = self_attention
        self.k_proj = nn.Linear(embed_dim, embed_dim, bias=True)
        self.v_proj = nn.Linear(embed_dim, embed_dim, bias=True)
        self.q_proj = nn.Linear(embed_dim, embed_dim, bias=True)
        self.out_proj = nn.Linear(embed_dim, embed_dim, bias=True)
        self.inner_attn_ln = (
            nn.LayerNorm(embed_dim, eps=args.layernorm_eps)
            if subln and self_attention
            else None
        )
        self.dropout_module = nn.Dropout(dropout)

    def forward(
        self,
        query,
        key,
        value,
        incremental_state=None,
        key_padding_mask=None,
        attn_mask=None,
        rel_pos=None,
        is_first_step=False,
    ):
        bsz, tgt_len, embed_dim = query.size()
        src_len = key.size(1)

        q = self.q_proj(query) * self.scaling
        k = self.k_proj(key)
        v = self.v_proj(value)

        def split(t, length):
            return (
                t.view(bsz, length, self.num_heads, self.head_dim)
                .transpose(1, 2)
                .reshape(bsz * self.num_heads, length, self.head_dim)
            )

        q, k, v = split(q, tgt_len), split(k, src_len), split(v, src_len)

        attn_weights = torch.bmm(q, k.transpose(1, 2))
        if attn_mask is not None:
            attn_weights = torch.nan_to_num(attn_weights)
            attn_mask = attn_mask.unsqueeze(0)
            attn_weights += attn_mask
        if key_padding_mask is not None:
            attn_weights = attn_weights.view(
                bsz, self.num_heads, tgt_len, src_len
            )
            attn_weights = attn_weights.masked_fill(
                key_padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool),
                float("-inf"),
            )
            attn_weights = attn_weights.view(
                bsz * self.num_heads, tgt_len, src_len
            )
        if rel_pos is not None:
            rel_pos = rel_pos.view(attn_weights.size())
            attn_weights = attn_weights + rel_pos
        attn_weights = F.softmax(
            attn_weights, dim=-1, dtype=torch.float32
        ).type_as(attn_weights)
        attn_probs = self.dropout_module(attn_weights)
        attn = torch.bmm(attn_probs, v)
        attn = (
            attn.view(bsz, self.num_heads, tgt_len, self.head_dim)
            .transpose(1, 2)
            .reshape(bsz, tgt_len, embed_dim)
        )
        if self.inner_attn_ln is not None:
            attn = self.inner_attn_ln(attn)
        attn = self.out_proj(attn)
        return attn, attn_weights.view(
            bsz, self.num_heads, tgt_len, src_len
        )


class FeedForwardNetwork(nn.Module):
    """``component/feedforward_network.py`` — fp32 activation, Magneto
    ``ffn_layernorm`` between activation and fc2 under subln."""

    def __init__(
        self,
        embed_dim,
        ffn_dim,
        activation_fn,
        dropout,
        activation_dropout,
        layernorm_eps,
        subln=False,
    ):
        super().__init__()
        self.embed_dim = embed_dim
        self.activation_fn = get_activation_fn(activation_fn)
        self.activation_dropout_module = nn.Dropout(activation_dropout)
        self.dropout_module = nn.Dropout(dropout)
        self.fc1 = nn.Linear(embed_dim, ffn_dim)
        self.fc2 = nn.Linear(ffn_dim, embed_dim)
        self.ffn_layernorm = (
            nn.LayerNorm(ffn_dim, eps=layernorm_eps) if subln else None
        )

    def forward(self, x):
        x_shape = x.shape
        x = x.reshape(-1, x.size(-1))
        x = self.fc1(x)
        x = self.activation_fn(x.float()).type_as(x)
        x = self.activation_dropout_module(x)
        if self.ffn_layernorm is not None:
            x = self.ffn_layernorm(x)
        x = self.fc2(x)
        x = x.view(x_shape)
        x = self.dropout_module(x)
        return x


class EncoderLayer(nn.Module):
    """``architecture/encoder.py::EncoderLayer`` — pre-LN residual
    blocks (deepnorm alpha fixed at 1.0 on this path)."""

    def __init__(self, args, depth=0):
        super().__init__()
        self.args = args
        self.embed_dim = args.encoder_embed_dim
        self.self_attn = MultiheadAttention(
            args,
            self.embed_dim,
            args.encoder_attention_heads,
            dropout=args.attention_dropout,
            self_attention=True,
            subln=args.subln,
        )
        self.self_attn_layer_norm = nn.LayerNorm(
            self.embed_dim, eps=args.layernorm_eps
        )
        self.dropout_module = nn.Dropout(args.dropout)
        self.normalize_before = args.encoder_normalize_before
        self.ffn = FeedForwardNetwork(
            self.embed_dim,
            args.encoder_ffn_embed_dim,
            args.activation_fn,
            args.dropout,
            args.activation_dropout,
            args.layernorm_eps,
            subln=args.subln,
        )
        self.final_layer_norm = nn.LayerNorm(
            self.embed_dim, eps=args.layernorm_eps
        )
        self.alpha = 1.0

    def residual_connection(self, x, residual):
        return residual * self.alpha + x

    def forward(
        self, x, encoder_padding_mask, attn_mask=None, rel_pos=None
    ):
        if attn_mask is not None:
            attn_mask = attn_mask.masked_fill(
                attn_mask.to(torch.bool), -1e8
            )
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(
            query=x,
            key=x,
            value=x,
            key_padding_mask=encoder_padding_mask,
            attn_mask=attn_mask,
            rel_pos=rel_pos,
        )
        x = self.dropout_module(x)
        x = self.residual_connection(x, residual)
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = self.ffn(x)
        x = self.residual_connection(x, residual)
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x


class Encoder(nn.Module):
    """``architecture/encoder.py::Encoder`` — token_embeddings path
    (no vocab, no positional embedding, no output projection)."""

    def __init__(
        self,
        args,
        embed_tokens=None,
        embed_positions=None,
        output_projection=None,
        is_encoder_decoder=False,
        **kwargs,
    ):
        super().__init__()
        self.args = args
        self.dropout_module = nn.Dropout(args.dropout)
        embed_dim = args.encoder_embed_dim
        self.embed_scale = (
            1.0 if args.no_scale_embedding else math.sqrt(embed_dim)
        )
        self.embed_tokens = embed_tokens
        self.embed_positions = embed_positions
        self.output_projection = None
        self.layernorm_embedding = (
            nn.LayerNorm(embed_dim, eps=args.layernorm_eps)
            if args.layernorm_embedding
            else None
        )
        self.layers = nn.ModuleList(
            [
                EncoderLayer(args, depth=i)
                for i in range(args.encoder_layers)
            ]
        )
        self.num_layers = len(self.layers)
        self.layer_norm = (
            nn.LayerNorm(embed_dim, eps=args.layernorm_eps)
            if args.encoder_normalize_before and args.normalize_output
            else None
        )
        self.relative_position = (
            RelativePositionBias(
                num_buckets=args.rel_pos_buckets,
                max_distance=args.max_rel_pos,
                n_heads=args.encoder_attention_heads,
            )
            if args.rel_pos_buckets > 0 and args.max_rel_pos > 0
            else None
        )
        if args.subln:
            # Magneto init: scale v/out/fc weights by sqrt(log 2N)
            init_scale = math.sqrt(math.log(args.encoder_layers * 2))
            for name, p in self.named_parameters():
                if (
                    "fc1" in name
                    or "fc2" in name
                    or "out_proj" in name
                    or "v_proj" in name
                ):
                    p.data.mul_(init_scale)

    def forward_embedding(self, src_tokens, token_embedding=None):
        if token_embedding is None:
            token_embedding = self.embed_tokens(src_tokens)
        x = embed = self.embed_scale * token_embedding
        if self.embed_positions is not None:
            if src_tokens is not None:
                x = embed + self.embed_positions(src_tokens)
            else:
                x = embed + self.embed_positions(x)
        if self.layernorm_embedding is not None:
            x = self.layernorm_embedding(x)
        x = self.dropout_module(x)
        return x, embed

    def forward(
        self,
        src_tokens,
        encoder_padding_mask=None,
        attn_mask=None,
        return_all_hiddens=False,
        token_embeddings=None,
        **kwargs,
    ):
        assert src_tokens is not None or token_embeddings is not None
        if encoder_padding_mask is None:
            if src_tokens is not None:
                encoder_padding_mask = torch.zeros_like(
                    src_tokens, dtype=torch.bool
                )
            else:
                encoder_padding_mask = torch.zeros(
                    [token_embeddings.size(0), token_embeddings.size(1)],
                    dtype=torch.bool,
                    device=token_embeddings.device,
                )
        x, encoder_embedding = self.forward_embedding(
            src_tokens, token_embeddings
        )
        x = x * (
            1 - encoder_padding_mask.unsqueeze(-1).type_as(x)
        )

        rel_pos_bias = None
        if self.relative_position is not None:
            rel_pos_bias = self.relative_position(
                batch_size=x.size(0), qlen=x.size(1), klen=x.size(1)
            )

        encoder_states = []
        if return_all_hiddens:
            encoder_states.append(x)
        for layer in self.layers:
            x = layer(
                x,
                encoder_padding_mask=encoder_padding_mask,
                attn_mask=attn_mask,
                rel_pos=rel_pos_bias,
            )
            if return_all_hiddens:
                encoder_states.append(x)

        if self.layer_norm is not None:
            x = self.layer_norm(x)

        return {
            "encoder_out": x,
            "encoder_embedding": encoder_embedding,
            "encoder_padding_mask": encoder_padding_mask,
            "encoder_states": encoder_states,
        }


def install() -> None:
    """Register the shim as ``torchscale.architecture.{config,encoder}``
    in ``sys.modules`` (idempotent)."""
    import sys
    import types

    if "torchscale" in sys.modules and hasattr(
        sys.modules["torchscale"], "__refshim__"
    ):
        return
    pkg = types.ModuleType("torchscale")
    pkg.__refshim__ = True
    arch = types.ModuleType("torchscale.architecture")
    config_mod = types.ModuleType("torchscale.architecture.config")
    config_mod.EncoderConfig = EncoderConfig
    encoder_mod = types.ModuleType("torchscale.architecture.encoder")
    encoder_mod.Encoder = Encoder
    encoder_mod.EncoderLayer = EncoderLayer
    pkg.architecture = arch
    arch.config = config_mod
    arch.encoder = encoder_mod
    sys.modules["torchscale"] = pkg
    sys.modules["torchscale.architecture"] = arch
    sys.modules["torchscale.architecture.config"] = config_mod
    sys.modules["torchscale.architecture.encoder"] = encoder_mod
