"""Multi-head attention with torch-MultiheadAttention semantics.

Used by the cross-modal encoder/decoder (reference
models/encoder_decoder_layers.py uses nn.MultiheadAttention throughout) and
by the JAX RoBERTa encoder. Matches torch semantics:
  * scaled dot-product, softmax over keys;
  * `key_padding_mask` True == PAD == masked out (reference inverts the HF
    attention mask at models/bdetr.py:169-171);
  * dropout applied to the attention probabilities;
  * separate q/k/v projections + output projection, all with bias
    (torch packs q/k/v into in_proj; a checkpoint converter just splits it).

All matmuls are batched (B*H fold) and feed the MXU; no flash kernel is
needed at these lengths (<=1024 visual tokens, <=256 text bins).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

XAVIER_UNIFORM = nn.initializers.xavier_uniform()


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,  # (B, Lq, F)
        key,  # (B, Lk, F)
        value,  # (B, Lk, F)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True=PAD
        *,
        train: bool = False,
    ):
        B, Lq, _ = query.shape
        Lk = key.shape[1]
        H = self.num_heads
        Dh = self.d_model // H
        assert Dh * H == self.d_model

        dense = lambda name: nn.Dense(
            self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
            name=name,
        )
        q = dense("q_proj")(query).reshape(B, Lq, H, Dh)
        k = dense("k_proj")(key).reshape(B, Lk, H, Dh)
        v = dense("v_proj")(value).reshape(B, Lk, H, Dh)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(Dh, q.dtype)
        )
        if key_padding_mask is not None:
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
            logits = jnp.where(
                key_padding_mask[:, None, None, :], neg, logits
            )
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            logits.dtype
        )
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
            B, Lq, self.d_model
        )
        return nn.Dense(
            self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
            name="out_proj",
        )(out)
