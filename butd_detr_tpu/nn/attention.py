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

On TPU the attention core (QK^T, masked softmax, prob-dropout, @V) runs
in the fused Pallas kernel (ops/pallas_attention.py) — the unfused form
materializes (B, H, Lq, Lk) logits and probabilities to HBM, which
dominates the encoder at L=1024. The unfused path remains for CPU/tests
and as `use_flash=False` opt-out; both paths implement identical
(torch) semantics.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

XAVIER_UNIFORM = nn.initializers.xavier_uniform()


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: Optional[bool] = None  # None = auto (TPU backend)
    # f32/HIGHEST matmuls inside the fused kernel (for strict-parity
    # studies) instead of the default bf16-input/f32-accumulate single
    # pass. None falls back to the BUTD_ATTN_PRECISE env var — a
    # process-start-only escape hatch; config-built models thread the
    # choice explicitly (Config.attn_precise) so it participates in the
    # jit cache key.
    precise: Optional[bool] = None

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

        use_flash = self.use_flash
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        if use_flash:
            from butd_detr_tpu.ops.pallas_attention import fused_attention

            p_drop = self.dropout if train else 0.0
            seed = None
            if p_drop > 0.0:
                bits = jax.random.bits(
                    self.make_rng("dropout"), (1,), jnp.uint32
                )
                seed = jax.lax.bitcast_convert_type(bits, jnp.int32)
            out = fused_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                key_padding_mask,
                sm_scale=1.0 / (float(Dh) ** 0.5),
                dropout_p=p_drop,
                dropout_seed=seed,
                precise=self.precise,
            ).transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
            return nn.Dense(
                self.d_model, kernel_init=XAVIER_UNIFORM, dtype=self.dtype,
                name="out_proj",
            )(out.astype(self.dtype))

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
