"""Cross-modal Bi-Encoder: vision/language self-attention + cross-attention.

Rebuild of reference `models/encoder_decoder_layers.py`:
  * `TransformerEncoderLayerNoFFN` (:127-156) — self-attn + residual + LN,
    no FFN;
  * `PosTransformerEncoderLayerNoFFN` (:159-186) — same, pos added to q,k
    only;
  * `CrossAttentionLayer` (:37-124) — lang<-vis cross-attn (+FFN), then
    vis<-lang (pos on the vision query only), optional vis<-detected-boxes,
    then vision FFN;
  * `BiEncoderLayer`/`BiEncoder` (:189-284) — 3 stacked layers at
    d_model=288, 8 heads, ffn 256, dropout 0.1.

Everything is batch-first `(B, L, F)` (torch's seq-first transposes are a
CPU-era layout artifact; XLA prefers batch-major), masks are
`key_padding_mask` with True == PAD.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from butd_detr_tpu.nn.attention import MultiHeadAttention

LN_EPS = 1e-5  # torch nn.LayerNorm default


class FFN(nn.Module):
    """Linear-ReLU-Dropout-Linear-Dropout (reference :52-58)."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class SelfAttnNoFFN(nn.Module):
    """Self-attn + residual + LN; optional positional add on q,k."""

    d_model: int
    n_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(self, x, pos=None, key_padding_mask=None, *, train=False):
        qk = x if pos is None else x + pos
        attn = MultiHeadAttention(
            self.d_model, self.n_heads, dropout=self.dropout,
            dtype=self.dtype, precise=self.attn_precise, name="self_attn",
        )(qk, qk, x, key_padding_mask=key_padding_mask, train=train)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32)(x + attn)


class CrossAttentionLayer(nn.Module):
    d_model: int = 288
    n_heads: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    use_butd_enc_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        vis_feats,
        vis_key_padding_mask,
        text_feats,
        text_key_padding_mask,
        pos_feats,
        detected_feats=None,
        detected_mask=None,
        *,
        train: bool = False,
    ):
        drop = lambda t: nn.Dropout(self.dropout, deterministic=not train)(t)
        norm = lambda name: nn.LayerNorm(
            epsilon=LN_EPS, dtype=jnp.float32, name=name
        )
        qv = vis_feats + pos_feats  # pos only on the vision query (:80-81)
        # NOTE: the reference binds cross-attention keys/values BEFORE any
        # update (`qt = kt = vt = text_feats`, :91-93): vision attends to
        # the ORIGINAL text features, not the cross_lv/FFN-updated ones
        # (:99-107 run first but :101's kt/vt were captured at :93).
        kt = vt = text_feats

        # language attends to vision
        t2 = MultiHeadAttention(
            self.d_model, self.n_heads, dropout=self.dropout,
            dtype=self.dtype, precise=self.attn_precise,
            name="cross_lv",
        )(text_feats, vis_feats, vis_feats,
          key_padding_mask=vis_key_padding_mask, train=train)
        text_feats = norm("norm_lv")(text_feats + drop(t2))
        text_feats = norm("norm_lv2")(
            text_feats
            + FFN(self.d_model, self.dim_feedforward, self.dropout,
                  dtype=self.dtype, name="ffn_lv")(text_feats, train=train)
        )

        # vision attends to (pre-update) language
        v2 = MultiHeadAttention(
            self.d_model, self.n_heads, dropout=self.dropout,
            dtype=self.dtype, precise=self.attn_precise,
            name="cross_vl",
        )(qv, kt, vt,
          key_padding_mask=text_key_padding_mask, train=train)
        vis_feats = norm("norm_vl")(vis_feats + drop(v2))

        # vision attends to detected boxes (butd stream, :110-119)
        if detected_feats is not None and self.use_butd_enc_attn:
            v2 = MultiHeadAttention(
                self.d_model, self.n_heads, dropout=self.dropout,
                dtype=self.dtype, precise=self.attn_precise,
            name="cross_d",
            )(vis_feats, detected_feats, detected_feats,
              key_padding_mask=detected_mask, train=train)
            vis_feats = norm("norm_d")(vis_feats + drop(v2))

        vis_feats = norm("norm_vl2")(
            vis_feats
            + FFN(self.d_model, self.dim_feedforward, self.dropout,
                  dtype=self.dtype, name="ffn_vl")(vis_feats, train=train)
        )
        return vis_feats, text_feats


class BiEncoderLayer(nn.Module):
    d_model: int = 288
    n_heads: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    self_attend_lang: bool = True
    self_attend_vis: bool = True
    use_butd_enc_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        vis_feats,
        pos_feats,
        padding_mask,
        text_feats,
        text_padding_mask,
        detected_feats=None,
        detected_mask=None,
        *,
        train: bool = False,
    ):
        if self.self_attend_vis:
            vis_feats = SelfAttnNoFFN(
                self.d_model, self.n_heads, self.dropout,
                dtype=self.dtype, attn_precise=self.attn_precise,
                name="self_attention_visual",
            )(vis_feats, pos=pos_feats, key_padding_mask=padding_mask,
              train=train)
        if self.self_attend_lang:
            text_feats = SelfAttnNoFFN(
                self.d_model, self.n_heads, self.dropout,
                dtype=self.dtype, attn_precise=self.attn_precise,
                name="self_attention_lang",
            )(text_feats, key_padding_mask=text_padding_mask, train=train)
        return CrossAttentionLayer(
            self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
            self.use_butd_enc_attn, dtype=self.dtype,
            attn_precise=self.attn_precise, name="cross_layer",
        )(vis_feats, padding_mask, text_feats, text_padding_mask, pos_feats,
          detected_feats, detected_mask, train=train)


class BiEncoder(nn.Module):
    num_layers: int = 3
    d_model: int = 288
    n_heads: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    self_attend: bool = True
    use_butd_enc_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        vis_feats,
        pos_feats,
        padding_mask,
        text_feats,
        text_padding_mask,
        detected_feats=None,
        detected_mask=None,
        *,
        train: bool = False,
    ):
        for i in range(self.num_layers):
            vis_feats, text_feats = BiEncoderLayer(
                self.d_model, self.n_heads, self.dim_feedforward,
                self.dropout,
                self_attend_lang=self.self_attend,
                self_attend_vis=self.self_attend,
                use_butd_enc_attn=self.use_butd_enc_attn,
                dtype=self.dtype, attn_precise=self.attn_precise,
                name=f"layer_{i}",
            )(vis_feats, pos_feats, padding_mask, text_feats,
              text_padding_mask, detected_feats, detected_mask, train=train)
        return vis_feats, text_feats
