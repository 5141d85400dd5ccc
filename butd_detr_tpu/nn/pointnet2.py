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
    furthest_point_sample_with_xyz,
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
    # candidate cloud is stored in spatially local (Hilbert) order — lets
    # the pruned ball query skip its device prep sorts (ops/pointcloud.py);
    # exactness never depends on the claim
    presorted: bool = False
    # the consuming MLP's compute dtype. bf16 routes the feature leg of
    # the grouping gather through the split two-dtype form: the MLP casts
    # features to bf16 anyway, so gathering them in bf16 is bit-identical
    # end to end (cast commutes with a copy) while the windowed Pallas
    # gather does a third fewer MXU passes; xyz stays f32-exact for the
    # center-subtract
    dtype: jnp.dtype = jnp.float32

    def __call__(self, xyz, new_xyz, features=None):
        idx = ball_query(
            self.radius, self.nsample, xyz, new_xyz,
            presorted=self.presorted,
        )
        if features is not None:
            if self.dtype == jnp.bfloat16:
                from butd_detr_tpu.ops import group_points_split

                gx, grouped_features = group_points_split(
                    xyz, features.astype(jnp.bfloat16), idx
                )
                grouped_xyz = gx - new_xyz[:, :, None, :]
                if self.normalize_xyz:
                    grouped_xyz = grouped_xyz / self.radius
            else:
                # ONE row gather for xyz+features: TPU gather cost is
                # per-row-dominated (the separate 3-channel xyz gather
                # costs as much as the 9-channel combined one), so the
                # concatenated array halves the hot sa1 grouping cost
                grouped = group_points(
                    jnp.concatenate([xyz, features], axis=-1), idx
                )
                grouped_xyz = grouped[..., :3] - new_xyz[:, :, None, :]
                if self.normalize_xyz:
                    grouped_xyz = grouped_xyz / self.radius
                grouped_features = grouped[..., 3:]
            if self.use_xyz:
                new_features = jnp.concatenate(
                    [grouped_xyz, grouped_features], axis=-1
                )
            else:
                new_features = grouped_features
        else:
            assert self.use_xyz, "need features or xyz"
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / self.radius
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
    presorted: bool = False  # see QueryAndGroup.presorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, *, train: bool = False):
        """xyz: (B, N, 3); features: (B, N, C) or None; inds: (B, npoint) or None.

        Returns (new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]),
        inds (B, npoint) int32).
        """
        if inds is None:
            # fused FPS+coords: the Pallas kernel emits the sampled xyz,
            # skipping a separate gather (ops/pointcloud.py)
            inds, new_xyz = furthest_point_sample_with_xyz(xyz, self.npoint)
        else:
            new_xyz = gather_points(xyz, inds)

        grouped, grouped_xyz = QueryAndGroup(
            self.radius, self.nsample,
            use_xyz=self.use_xyz, normalize_xyz=self.normalize_xyz,
            presorted=self.presorted, dtype=self.dtype,
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


class GroupAll(nn.Module):
    """Group every point into one 'ball' (reference pointnet2_utils.GroupAll
    :379-426): returns (B, 1, N, 3 [+C])."""

    use_xyz: bool = True

    def __call__(self, xyz, new_xyz=None, features=None):
        grouped_xyz = xyz[:, None, :, :]  # (B, 1, N, 3)
        if features is not None:
            grouped = features[:, None, :, :]
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        else:
            grouped = grouped_xyz
        return grouped, grouped_xyz


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference
    pointnet2_modules.py:78-124): one FPS, several (radius, nsample, mlp)
    branches max-pooled and concatenated along channels. npoint=None uses
    GroupAll (global pooling)."""

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per scale, EXCLUDING the input dim
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, *, train: bool = False):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            if inds is None:
                inds = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, inds)
        else:
            new_xyz = None

        outs = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            if self.npoint is not None:
                grouped, _ = QueryAndGroup(
                    radius, nsample, use_xyz=self.use_xyz
                )(xyz, new_xyz, features)
            else:
                grouped, _ = GroupAll(use_xyz=self.use_xyz)(
                    xyz, None, features
                )
            out = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{i}")(
                grouped, train=train
            )
            outs.append(jnp.max(out, axis=2))  # (B, npoint|1, mlp[-1])
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale convenience wrapper (pointnet2_modules.py:127-160)."""

    @classmethod
    def create(cls, *, mlp, npoint=None, radius=None, nsample=None,
               use_xyz=True, dtype=jnp.float32, name=None):
        return cls(
            npoint=npoint, radii=(radius,), nsamples=(nsample,),
            mlps=(tuple(mlp),), use_xyz=use_xyz, dtype=dtype, name=name,
        )


class PointnetLFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation from xyz1 onto xyz2
    (reference pointnet2_modules.py:418-497; defined for completeness —
    unused by BeaUTyDETR). Each scale: group xyz1-features around xyz2
    centers -> MLP -> max-pool -> concat skip features2 -> post-MLP."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    post_mlp: Sequence[int]
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz2, xyz1, features2, features1, *,
                 train: bool = False):
        outs = []
        post = SharedMLP(self.post_mlp, dtype=self.dtype, name="post_mlp")
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            grouped, _ = QueryAndGroup(
                radius, nsample, use_xyz=self.use_xyz
            )(xyz1, xyz2, features1)
            out = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{i}")(
                grouped, train=train
            )
            out = jnp.max(out, axis=2)  # (B, N2, mlp[-1])
            if features2 is not None:
                out = jnp.concatenate([out, features2], axis=-1)
            outs.append(post(out[:, :, None, :], train=train)[:, :, 0, :])
        return jnp.concatenate(outs, axis=-1)
