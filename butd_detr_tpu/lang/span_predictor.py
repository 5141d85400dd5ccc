"""Span predictor: per-token binary classifier over utterances.

Rebuild of the reference side pipeline `src/text_cls.py:384-406`
(`TextClassifier`): trainable RoBERTa trunk + projector
Linear(768->256)+ReLU+Dropout(0.1)+Linear(256->1), trained with BCE against
the ground-truth span map; at inference, thresholded scores (>0) become the
256-bin predicted span distributions consumed by the main dataset
(`{dataset}_pred_spans.json`, joint_det_dataset.py:137-220).
"""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from butd_detr_tpu.lang.roberta import RobertaConfig, RobertaModel


class SpanPredictor(nn.Module):
    config: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, *, train: bool = False):
        """Returns per-token span logits (B, L)."""
        x = RobertaModel(self.config, dtype=self.dtype, name="text_encoder")(
            input_ids, attention_mask, train=train
        )
        x = nn.Dense(256, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(1, dtype=self.dtype)(x)[..., 0]


def span_bce_loss(logits, positive_map, attention_mask=None):
    """BCE-with-logits vs the GT span map (text_cls.py:93-96).

    The reference averages over the full (B, L) grid including padding;
    we replicate that by default, but also support masked averaging.
    """
    z = logits.astype(jnp.float32)
    t = positive_map.astype(jnp.float32)
    per = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    if attention_mask is None:
        return per.mean()
    w = attention_mask.astype(jnp.float32)
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


def scores_to_pred_spans(scores: np.ndarray) -> np.ndarray:
    """Convert thresholded scores to normalized 256-bin span distributions.

    Mirrors the --store path (text_cls.py:111-121): binarize at 0; rows with
    no positive bin fall back to a one-hot at the argmax; L1-normalize.
    """
    B, L = scores.shape
    pad = np.zeros((B, 256), np.float32)
    pad[:, :L] = (scores > 0).astype(np.float32)
    empty = pad.sum(1) < 1
    if empty.any():
        am = scores[empty].argmax(1)
        pad[np.flatnonzero(empty), am] = 1.0
    return pad / pad.sum(1, keepdims=True)
