"""Learned absolute position embeddings.

Mirrors reference `PositionEmbeddingLearned` (models/modules.py:52-67 and
encoder_decoder_layers.py:19-34): Conv1d(in->F)+BN+ReLU+Conv1d(F->F) over
coordinates, channels-last here (pointwise Dense). Both convs keep their
bias (plain nn.Conv1d in the reference, bias=True even before BN).
"""

import jax.numpy as jnp
from flax import linen as nn

from butd_detr_tpu.nn.mlp import BN_EPS, BN_MOMENTUM


class PositionEmbeddingLearned(nn.Module):
    num_pos_feats: int = 288
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, *, train: bool = False):
        """xyz: (B, N, 3 or 6) -> (B, N, num_pos_feats)."""
        x = nn.Dense(self.num_pos_feats, dtype=self.dtype)(xyz)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, dtype=self.dtype)(x)
