"""Node_RNN — per-DOM time-series GRU (mirror of reference
``src/graphnet/models/rnn/node_rnn.py:17-136``).

The reference splits the pulse array into per-DOM sub-sequences and runs a
packed cuDNN GRU.  TPU-native formulation: one ``lax.scan`` over the padded
pulse axis with hidden-state *reset* at each ``new_node_col`` boundary —
segment-wise recurrence without ragged packing.  DOM summary nodes are then
compacted to the front of the node axis via segment gathers, so downstream
backbones see a normal (x, mask) padded batch of DOM nodes whose features
are ``[summary features, GRU final state]``.

Input batches must come from ``NodeAsDOMTimeSeries`` (last feature column is
``new_node_col``; charge column holds linear charge).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphnet_tpu.batch import EventBatch
from graphnet_tpu.models.components.embedding import SinusoidalPosEmb
from graphnet_tpu.models.gnn.gnn import GNN


class _ResetGRUCell(nn.Module):
    """One GRU step with hidden-state reset at sequence boundaries."""

    features: int

    @nn.compact
    def __call__(self, carry, inp):
        x_t, r_t = inp
        h = jnp.where(r_t[:, None] > 0, 0.0, carry)
        h, y = nn.GRUCell(features=self.features, name="gru")(h, x_t)
        return h, y


class _ResettingGRULayer(nn.Module):
    """GRU over the time axis; hidden state resets where ``reset`` is 1."""

    hidden_size: int

    @nn.compact
    def __call__(self, xs: jax.Array, reset: jax.Array) -> jax.Array:
        """xs: [B, L, D], reset: [B, L] -> hidden state after each step
        [B, L, H]."""
        B, L, D = xs.shape
        scan = nn.scan(
            _ResetGRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(features=self.hidden_size, name="cell")
        h0 = jnp.zeros((B, self.hidden_size), xs.dtype)
        xs_t = jnp.swapaxes(xs, 0, 1)  # [L, B, D]
        reset_t = jnp.swapaxes(reset, 0, 1)  # [L, B]
        _, ys = scan(h0, (xs_t, reset_t))
        return jnp.swapaxes(ys, 0, 1)  # [B, L, H]


class NodeRNN(GNN):
    """Per-DOM GRU summariser emitting DOM-level nodes.

    Returns an updated EventBatch whose nodes are DOMs with features
    ``[original features (charge -> asinh(sum)), rnn final state]``.
    """

    nb_inputs: int
    hidden_size: int
    num_layers: int
    time_series_columns: Tuple[int, ...]
    nb_neighbours: int = 8
    features_subset: Optional[Tuple[int, ...]] = None
    dropout: float = 0.5
    embedding_dim: int = 0
    deterministic: bool = True
    # Which stacked-GRU layer's final hidden state becomes the DOM
    # feature.  The reference indexes ``h_n[0]`` — the FIRST layer — via
    # ``self._rnn(time_series)[-1][0]`` (``rnn/node_rnn.py:110``), so for
    # ``num_layers > 1`` the deeper layers' outputs are computed but
    # unused there.  Default mirrors the reference (checkpoint parity);
    # set to ``num_layers - 1`` for the conventional last-layer state.
    final_state_layer: int = 0

    @property
    def nb_outputs(self) -> int:
        return self.hidden_size + 5

    @nn.compact
    def __call__(self, batch: EventBatch) -> EventBatch:
        x, mask = batch.x, batch.mask
        B, L, D = x.shape
        new_node = (x[..., -1] > 0.5) & mask  # [B, L]
        charge_col = self.time_series_columns[0]

        ts = x[..., list(self.time_series_columns)]
        if self.embedding_dim:
            emb = SinusoidalPosEmb(dim=self.embedding_dim, name="emb")(
                ts * 4096.0
            )
            ts = emb.reshape(B, L, -1)

        h = ts
        reset = new_node.astype(x.dtype)
        state_src = None
        for layer in range(self.num_layers):
            h = _ResettingGRULayer(
                self.hidden_size, name=f"gru_{layer}"
            )(h, reset)
            if layer == self.final_state_layer:
                state_src = h
            if layer + 1 < self.num_layers and self.dropout > 0:
                h = nn.Dropout(
                    self.dropout, deterministic=self.deterministic
                )(h)
        assert state_src is not None, (
            f"final_state_layer={self.final_state_layer} out of range "
            f"for num_layers={self.num_layers}"
        )
        h = state_src

        # segment bookkeeping (per event): seg id of each pulse, first/last
        # pulse index per segment, segment charge sums
        seg = jnp.cumsum(new_node.astype(jnp.int32), axis=1) - 1  # [B, L]
        seg = jnp.clip(seg, 0, L - 1)
        pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        big = jnp.int32(L)

        def per_event(seg_e, mask_e, pos_e, charge_e, h_e, x_e):
            valid_pos = jnp.where(mask_e, pos_e, big)
            first = jax.ops.segment_min(
                valid_pos, seg_e, num_segments=L
            )
            neg_pos = jnp.where(mask_e, pos_e, -1)
            last = jax.ops.segment_max(neg_pos, seg_e, num_segments=L)
            charge_sum = jax.ops.segment_sum(
                jnp.where(mask_e, charge_e, 0.0), seg_e, num_segments=L
            )
            valid_dom = (first < big) & (last >= 0)
            first_c = jnp.clip(first, 0, L - 1)
            last_c = jnp.clip(last, 0, L - 1)
            dom_feats = x_e[first_c]  # [L, D]
            dom_state = h_e[last_c]  # [L, H]
            return dom_feats, dom_state, charge_sum, valid_dom

        dom_feats, dom_state, charge_sum, valid_dom = jax.vmap(per_event)(
            seg,
            mask,
            pos,
            x[..., charge_col],
            h,
            x,
        )

        # drop the new_node column, replace charge with asinh(sum)
        dom_feats = dom_feats[..., :-1]
        dom_feats = dom_feats.at[..., charge_col].set(
            jnp.arcsinh(charge_sum)
        )
        nodes = jnp.concatenate([dom_feats, dom_state], axis=-1)
        nodes = jnp.where(valid_dom[..., None], nodes, 0.0)

        # n_pulses is deliberately NOT updated to the DOM count: the
        # reference Node_RNN leaves ``data.n_pulses`` at the original
        # per-event pulse count (`rnn/node_rnn.py:92-136` never touches
        # it), and the downstream DynEdgeTITO consumes it as the
        # ``log10(n_pulses)`` global feature (`gnn/dynedge_kaggle_tito.py:
        # 249-254`)
        return batch.replace(
            x=nodes,
            mask=valid_dom,
            edges=None,
            edge_mask=None,
        )
