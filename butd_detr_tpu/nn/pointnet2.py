"""PointNet++ set-abstraction and feature-propagation modules (channels-last).

TPU-first re-design of reference `pointnet2/pointnet2_modules.py`:
`PointnetSAModuleVotes` (:164-272) and `PointnetFPModule` (:356-416).
All shapes are fixed; grouping indices come from the ops layer; the MLPs
are pointwise Dense stacks (see nn/mlp.py) so the heavy compute is batched
matmuls on the MXU.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from butd_detr_tpu.nn.mlp import SharedMLP
from butd_detr_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


class QueryAndGroup(nn.Module):
    """Ball-query grouping with center-subtract and optional radius-normalize.

    Mirrors reference `pointnet2_utils.QueryAndGroup` (:294-376),
    channels-last: returns `(B, npoint, nsample, 3 [+C])`.
    """

    radius: float
    nsample: int
    use_xyz: bool = True
    normalize_xyz: bool = False

    def __call__(self, xyz, new_xyz, features=None):
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped_features = group_points(features, idx)
            if self.use_xyz:
                new_features = jnp.concatenate(
                    [grouped_xyz, grouped_features], axis=-1
                )
            else:
                new_features = grouped_features
        else:
            assert self.use_xyz, "need features or xyz"
            new_features = grouped_xyz
        return new_features, grouped_xyz


class PointnetSAModuleVotes(nn.Module):
    """Single-scale set abstraction: FPS -> gather -> group -> MLP -> pool.

    Mirrors reference `PointnetSAModuleVotes` (pointnet2_modules.py:164-272)
    with `pooling` in {max, avg, rbf}. The MLP input channel gets +3 when
    `use_xyz` (pointnet2_modules.py:204-206).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]  # hidden+out channels, EXCLUDING the input dim
    use_xyz: bool = True
    normalize_xyz: bool = False
    pooling: str = "max"
    sigma: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, *, train: bool = False):
        """xyz: (B, N, 3); features: (B, N, C) or None; inds: (B, npoint) or None.

        Returns (new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]),
        inds (B, npoint) int32).
        """
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)

        grouped, grouped_xyz = QueryAndGroup(
            self.radius, self.nsample,
            use_xyz=self.use_xyz, normalize_xyz=self.normalize_xyz,
        )(xyz, new_xyz, features)

        new_features = SharedMLP(self.mlp, dtype=self.dtype)(
            grouped, train=train
        )  # (B, npoint, nsample, C_out)

        if self.pooling == "max":
            new_features = jnp.max(new_features, axis=2)
        elif self.pooling == "avg":
            new_features = jnp.mean(new_features, axis=2)
        elif self.pooling == "rbf":
            sigma = self.sigma if self.sigma is not None else self.radius / 2
            rbf = jnp.exp(
                -jnp.sum(grouped_xyz**2, axis=-1) / (sigma**2) / 2
            )  # (B, npoint, nsample)
            new_features = (
                jnp.sum(new_features * rbf[..., None], axis=2) / self.nsample
            )
        else:
            raise ValueError(f"unknown pooling {self.pooling}")

        return new_xyz, new_features, inds


class PointnetFPModule(nn.Module):
    """Feature propagation: 3NN inverse-distance interpolation + skip + MLP.

    Mirrors reference `PointnetFPModule` (pointnet2_modules.py:356-416):
    weights 1/(dist+1e-8) normalized over the 3 neighbors; channel order is
    [interpolated, skip] to match the reference concat (:404-406).
    """

    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, unknown, known, unknown_feats, known_feats, *, train: bool = False
    ):
        """unknown: (B, n, 3); known: (B, m, 3); *_feats channels-last."""
        dist, idx = three_nn(unknown, known)
        dist_recip = 1.0 / (dist + 1e-8)
        weight = dist_recip / jnp.sum(dist_recip, axis=-1, keepdims=True)
        interpolated = three_interpolate(known_feats, idx, weight)

        if unknown_feats is not None:
            new_features = jnp.concatenate(
                [interpolated, unknown_feats], axis=-1
            )
        else:
            new_features = interpolated
        return SharedMLP(self.mlp, dtype=self.dtype)(new_features, train=train)
