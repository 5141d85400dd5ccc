"""Class-name RoBERTa embeddings for the detected-box ("butd") stream.

Rebuild of reference `data/gen_class_embeddings.py:8-25`: embed each of the
485 ScanNet class names with RoBERTa and mean-pool the token states
(attention-weighted sum / length). The resulting (num_classes, 768) table
initializes the model's `butd_class_embeddings` parameter
(models/bdetr.py:86-92 in the reference; `butd_class_embeddings` param in
ours).
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def generate_class_embeddings(
    config,
    params,
    tokenizer,
    class_names: List[str],
    max_len: int = 16,
    batch_size: int = 64,
) -> np.ndarray:
    """(num_classes, hidden) mean-pooled RoBERTa embeddings.

    Replicates gen_class_embeddings.py:17-25: sum over token states
    weighted by the attention mask, divided by the token count.
    """
    from butd_detr_tpu.lang.roberta import RobertaModel

    model = RobertaModel(config)

    @jax.jit
    def embed(ids, mask):
        hidden = model.apply({"params": params}, ids, mask, train=False)
        w = mask[..., None].astype(hidden.dtype)
        return (hidden * w).sum(1) / jnp.maximum(w.sum(1), 1.0)

    out = []
    for i in range(0, len(class_names), batch_size):
        chunk = class_names[i:i + batch_size]
        tok = tokenizer(chunk, max_len=max_len)
        out.append(np.asarray(embed(tok.ids, tok.attention_mask)))
    return np.concatenate(out, axis=0)


def load_class_embeddings_into_params(params, table: np.ndarray):
    """Overwrite the model's butd_class_embeddings with a precomputed
    table (reference copies class_embeddings3d.npy at bdetr.py:88-91)."""
    params = dict(params)
    assert params["butd_class_embeddings"].shape == table.shape, (
        params["butd_class_embeddings"].shape, table.shape
    )
    params["butd_class_embeddings"] = jnp.asarray(table)
    return params
