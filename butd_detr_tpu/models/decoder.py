"""Bi-Decoder layer: query self-attn -> cross(lang) -> cross(boxes) ->
cross(vision) -> FFN.

Rebuild of reference `BiDecoderLayer` (models/encoder_decoder_layers.py:
287-406): the query positional embedding is a learned MLP of the current
box estimate ([center, size] 6-d for 'loc_learned'), added to the query for
every attention's q (and k in self-attention); the vision cross-attention
uses no key padding mask (all 1024 seeds are real).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from butd_detr_tpu.models.encoder import FFN, LN_EPS
from butd_detr_tpu.nn.attention import MultiHeadAttention
from butd_detr_tpu.nn.position import PositionEmbeddingLearned


class BiDecoderLayer(nn.Module):
    d_model: int = 288
    n_heads: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    self_position_embedding: str = "loc_learned"  # none | xyz_learned | loc_learned
    butd: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        query,  # (B, V, F)
        vis_feats,  # (B, P, F)
        lang_feats,  # (B, L, F)
        query_pos,  # (B, V, 3 or 6) raw coordinates, or None
        query_mask,  # (B, V) True=PAD or None
        text_key_padding_mask,  # (B, L) True=PAD
        detected_feats=None,
        detected_mask=None,
        *,
        train: bool = False,
    ):
        drop = lambda t: nn.Dropout(self.dropout, deterministic=not train)(t)
        norm = lambda name: nn.LayerNorm(
            epsilon=LN_EPS, dtype=jnp.float32, name=name
        )
        mha = lambda name: MultiHeadAttention(
            self.d_model, self.n_heads, dropout=self.dropout,
            dtype=self.dtype, precise=self.attn_precise, name=name,
        )

        if self.self_position_embedding != "none" and query_pos is not None:
            pos = PositionEmbeddingLearned(
                self.d_model, dtype=self.dtype, name="self_posembed",
            )(query_pos, train=train)
        else:
            pos = jnp.zeros_like(query)

        # self attention (q,k get pos)
        q2 = mha("self_attn")(
            query + pos, query + pos, query,
            key_padding_mask=query_mask, train=train,
        )
        query = norm("norm1")(query + drop(q2))

        # cross attend to language
        q2 = mha("cross_l")(
            query + pos, lang_feats, lang_feats,
            key_padding_mask=text_key_padding_mask, train=train,
        )
        query = norm("norm_l")(query + drop(q2))

        # cross attend to detected boxes
        if self.butd and detected_feats is not None:
            q2 = mha("cross_d")(
                query + pos, detected_feats, detected_feats,
                key_padding_mask=detected_mask, train=train,
            )
            query = norm("norm_d")(query + drop(q2))

        # cross attend to vision (no padding mask, :394-400)
        q2 = mha("cross_v")(
            query + pos, vis_feats, vis_feats,
            key_padding_mask=None, train=train,
        )
        query = norm("norm_v")(query + drop(q2))

        query = norm("norm2")(
            query
            + FFN(self.d_model, self.dim_feedforward, self.dropout,
                  dtype=self.dtype, name="ffn")(query, train=train)
        )
        return query
