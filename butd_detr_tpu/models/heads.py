"""Prediction heads and query-selection modules.

Rebuild of reference `models/modules.py`:
  * `PointsObjClsModule` (:19-49) — per-seed objectness logits,
    Dense+BN+ReLU x2 + Dense(1) (torch used Conv1d with default bias even
    before BN; kept for weight parity);
  * `GeneralSamplingModule` (:70-86) — gather xyz/features at given inds;
  * `ThreeLayerMLP` (:89-108) — Dense(no-bias)+BN+ReLU+Dropout(0.3) x2 +
    Dense(out);
  * `ClsAgnosticPredictHead` (:111-180) — center residual (added to
    base_xyz), size regression, 256-way soft-token scores.
"""

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from butd_detr_tpu.nn.mlp import BN_EPS, BN_MOMENTUM
from butd_detr_tpu.ops import gather_points


class PointsObjClsModule(nn.Module):
    d_model: int = 288
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_features, *, train: bool = False):
        """(B, K, F) -> (B, K) objectness logits."""
        x = seed_features
        for name in ("conv1", "conv2"):
            x = nn.Dense(self.d_model, dtype=self.dtype, name=name)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=jnp.float32, name=name + "_bn",
            )(x)
            x = nn.relu(x)
        return nn.Dense(1, dtype=self.dtype, name="conv3")(x)[..., 0]


def general_sampling(xyz, features, sample_inds):
    """Gather (xyz, features) at sample_inds — reference
    `GeneralSamplingModule` (modules.py:70-86), channels-last."""
    return (
        gather_points(xyz, sample_inds),
        gather_points(features, sample_inds),
        sample_inds,
    )


class ThreeLayerMLP(nn.Module):
    dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(2):
            x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=jnp.float32, name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(0.3, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="dense_out")(x)


class ClsAgnosticPredictHead(nn.Module):
    num_class: int = 256
    seed_feat_dim: int = 288
    objectness: bool = False
    compute_sem_scores: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features, base_xyz, *, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """features: (B, V, F) channels-last; base_xyz: (B, V, 3).

        Returns dict with center / pred_size / sem_cls_scores / base_xyz
        (the reference writes these into end_points with a prefix,
        modules.py:174-179).
        """
        out = {"base_xyz": base_xyz}
        if self.objectness:
            out["objectness_scores"] = ThreeLayerMLP(
                self.seed_feat_dim, 1, dtype=self.dtype,
                name="objectness_scores_head",
            )(features, train=train)[..., 0]

        center_residual = ThreeLayerMLP(
            self.seed_feat_dim, 3, dtype=self.dtype,
            name="center_residual_head",
        )(features, train=train)
        out["center"] = base_xyz + center_residual

        out["pred_size"] = ThreeLayerMLP(
            self.seed_feat_dim, 3, dtype=self.dtype, name="size_pred_head",
        )(features, train=train)

        if self.compute_sem_scores:
            out["sem_cls_scores"] = ThreeLayerMLP(
                self.seed_feat_dim, self.num_class, dtype=self.dtype,
                name="sem_cls_scores_head",
            )(features, train=train)
        return out
