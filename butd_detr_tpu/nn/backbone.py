"""PointNet++ visual backbone with the reference hyperparameters.

Mirrors `models/backbone_module.py:26-144` (4 single-scale SA layers with
npoint 2048/1024/512/256, radius 0.2/0.4/0.8/1.2, nsample 64/32/16/16,
normalize_xyz=True; 2 FP layers back up to 1024 seeds x output_dim), with
channels-last tensors. Outputs the same end-point key schema:
sa{i}_xyz / sa{i}_features / sa{1,2}_inds / fp2_features / fp2_xyz /
fp2_inds, where `fp2_inds = sa1_inds[:, :1024]` (backbone_module.py:142).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from butd_detr_tpu.nn.pointnet2 import PointnetFPModule, PointnetSAModuleVotes


class Pointnet2Backbone(nn.Module):
    input_feature_dim: int = 0
    width: int = 1
    depth: int = 2
    output_dim: int = 288
    # Sampling schedule; defaults are the reference's
    # (backbone_module.py:44-81). Override for small-scale tests.
    npoints: tuple = (2048, 1024, 512, 256)
    radii: tuple = (0.2, 0.4, 0.8, 1.2)
    nsamples: tuple = (64, 32, 16, 16)
    # input cloud is stored in spatially local (Hilbert) order — applies
    # to sa1 only (sa2-4 query FPS subsets, whose order is max-min spread)
    input_presorted: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pointcloud, *, train: bool = False):
        """pointcloud: (B, N, 3 + input_feature_dim), xyz first.

        Returns dict of end points (channels-last features).
        """
        w, d = self.width, self.depth
        xyz = pointcloud[..., :3]
        features = (
            pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        )

        end_points = {}

        sa_cfg = dict(use_xyz=True, normalize_xyz=True, dtype=self.dtype)
        np_, r_, ns_ = self.npoints, self.radii, self.nsamples
        xyz1, feat1, inds1 = PointnetSAModuleVotes(
            npoint=np_[0], radius=r_[0], nsample=ns_[0],
            mlp=[64 * w] * d + [128 * w], **sa_cfg,
            presorted=self.input_presorted, name="sa1",
        )(xyz, features, train=train)
        end_points["sa1_inds"] = inds1
        end_points["sa1_xyz"] = xyz1
        end_points["sa1_features"] = feat1

        xyz2, feat2, inds2 = PointnetSAModuleVotes(
            npoint=np_[1], radius=r_[1], nsample=ns_[1],
            mlp=[128 * w] * d + [256 * w], **sa_cfg, name="sa2",
        )(xyz1, feat1, train=train)
        end_points["sa2_inds"] = inds2
        end_points["sa2_xyz"] = xyz2
        end_points["sa2_features"] = feat2

        xyz3, feat3, _ = PointnetSAModuleVotes(
            npoint=np_[2], radius=r_[2], nsample=ns_[2],
            mlp=[128 * w] * d + [256 * w], **sa_cfg, name="sa3",
        )(xyz2, feat2, train=train)
        end_points["sa3_xyz"] = xyz3
        end_points["sa3_features"] = feat3

        xyz4, feat4, _ = PointnetSAModuleVotes(
            npoint=np_[3], radius=r_[3], nsample=ns_[3],
            mlp=[128 * w] * d + [256 * w], **sa_cfg, name="sa4",
        )(xyz3, feat3, train=train)
        end_points["sa4_xyz"] = xyz4
        end_points["sa4_features"] = feat4

        feat3_up = PointnetFPModule(
            mlp=[256 * w, 256 * w], dtype=self.dtype, name="fp1",
        )(xyz3, xyz4, feat3, feat4, train=train)
        feat2_up = PointnetFPModule(
            mlp=[256 * w, self.output_dim], dtype=self.dtype, name="fp2",
        )(xyz2, xyz3, feat2, feat3_up, train=train)

        end_points["fp2_features"] = feat2_up  # (B, 1024, output_dim)
        end_points["fp2_xyz"] = end_points["sa2_xyz"]
        num_seed = end_points["fp2_xyz"].shape[1]
        end_points["fp2_inds"] = end_points["sa1_inds"][:, :num_seed]
        return end_points
