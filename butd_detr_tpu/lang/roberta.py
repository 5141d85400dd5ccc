"""RoBERTa encoder in JAX/flax, with an HF-torch weight converter.

The reference consumes `transformers.RobertaModel` as a frozen feature
extractor (models/bdetr.py:73-77) and as a trainable span-predictor trunk
(src/text_cls.py:384-397). Here the architecture is implemented natively in
flax so the params live in the same pytree machinery as the rest of the
model (frozen-ness is an optimizer concern), with
`convert_hf_roberta_state_dict` mapping a `roberta-base` torch state dict
onto our parameter tree for weight parity.

Post-LN transformer encoder, GELU FFN, learned positions with RoBERTa's
pad-offset position ids (positions = cumsum(mask)*mask + pad_id).
"""

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from butd_detr_tpu.nn.attention import MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


def roberta_base_config() -> RobertaConfig:
    return RobertaConfig()


def tiny_roberta_config(**kw) -> RobertaConfig:
    """A small config for tests / offline runs without pretrained weights."""
    defaults = dict(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130,
    )
    defaults.update(kw)
    return RobertaConfig(**defaults)


def small_text_roberta_config() -> RobertaConfig:
    """The accuracy-study '--small_text' trunk: 4 layers x 128-d x 4 heads
    over SimpleTokenizer's hashed 1024 vocab — small enough to become
    class-discriminative from scratch within a few-thousand-step study
    (the offline proxy for the reference's pretrained roberta-base,
    /root/reference/models/bdetr.py:73-77). Shared by accuracy_study /
    diag_grounding / the attribution probes so the architecture literal
    cannot drift between the trainer and checkpoint consumers."""
    return tiny_roberta_config(
        hidden_size=128, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=256,
    )


def create_position_ids(input_ids: jnp.ndarray, pad_token_id: int):
    """RoBERTa position ids: pad positions get pad_id, others count from it."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


class RobertaEmbeddings(nn.Module):
    config: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, *, train: bool = False):
        c = self.config
        pos_ids = create_position_ids(input_ids, c.pad_token_id)
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm")(x)
        return nn.Dropout(c.hidden_dropout, deterministic=not train)(x)


class RobertaLayer(nn.Module):
    config: RobertaConfig
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(self, x, pad_mask, *, train: bool = False):
        c = self.config
        attn_out = MultiHeadAttention(
            c.hidden_size, c.num_attention_heads,
            dropout=c.attention_dropout, dtype=self.dtype,
            precise=self.attn_precise, name="attention",
        )(x, x, x, key_padding_mask=pad_mask, train=train)
        attn_out = nn.Dropout(c.hidden_dropout, deterministic=not train)(
            attn_out
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="attention_norm")(x + attn_out)

        h = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(c.hidden_dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                            name="output_norm")(x + h)


class RobertaModel(nn.Module):
    """Returns last_hidden_state (B, L, hidden)."""

    config: RobertaConfig
    dtype: jnp.dtype = jnp.float32
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *, train: bool = False):
        c = self.config
        if attention_mask is None:
            attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)
        pad_mask = attention_mask == 0  # True == PAD
        x = RobertaEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, train=train
        )
        for i in range(c.num_hidden_layers):
            x = RobertaLayer(c, dtype=self.dtype,
                             attn_precise=self.attn_precise,
                             name=f"layer_{i}")(
                x, pad_mask, train=train
            )
        return x


# --------------------------------------------------------------- converter


def convert_hf_roberta_state_dict(
    state_dict: Dict[str, Any], config: Optional[RobertaConfig] = None
) -> Dict[str, Any]:
    """Map an HF `RobertaModel.state_dict()` (torch) onto our param tree.

    Accepts keys with or without a leading 'roberta.' prefix. Returns a
    nested dict suitable for `{'params': ...}` on `RobertaModel.apply`.
    Dense kernels are transposed (torch stores (out, in)).
    """
    config = config or roberta_base_config()

    def get(k):
        for kk in (k, "roberta." + k):
            if kk in state_dict:
                v = state_dict[kk]
                return np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v
                )
        raise KeyError(k)

    def lin(prefix):
        return {
            "kernel": get(prefix + ".weight").T,
            "bias": get(prefix + ".bias"),
        }

    def ln(prefix):
        return {
            "scale": get(prefix + ".weight"),
            "bias": get(prefix + ".bias"),
        }

    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": get("embeddings.word_embeddings.weight")
            },
            "position_embeddings": {
                "embedding": get("embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {
                "embedding": get("embeddings.token_type_embeddings.weight")
            },
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": lin(p + ".attention.self.query"),
                "k_proj": lin(p + ".attention.self.key"),
                "v_proj": lin(p + ".attention.self.value"),
                "out_proj": lin(p + ".attention.output.dense"),
            },
            "attention_norm": ln(p + ".attention.output.LayerNorm"),
            "intermediate": lin(p + ".intermediate.dense"),
            "output": lin(p + ".output.dense"),
            "output_norm": ln(p + ".output.LayerNorm"),
        }
    return params
