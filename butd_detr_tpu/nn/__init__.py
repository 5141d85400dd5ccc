"""NN building blocks: shared MLPs, PointNet++ modules, the visual backbone."""

from butd_detr_tpu.nn.backbone import Pointnet2Backbone
from butd_detr_tpu.nn.mlp import BNMomentumScheduler, ConvBNRelu1d, SharedMLP
from butd_detr_tpu.nn.pointnet2 import (
    GroupAll,
    PointnetFPModule,
    PointnetLFPModuleMSG,
    PointnetSAModule,
    PointnetSAModuleMSG,
    PointnetSAModuleVotes,
    QueryAndGroup,
)
from butd_detr_tpu.nn.position import PositionEmbeddingLearned

__all__ = [
    "BNMomentumScheduler",
    "ConvBNRelu1d",
    "GroupAll",
    "PointnetFPModule",
    "PointnetLFPModuleMSG",
    "PointnetSAModule",
    "PointnetSAModuleMSG",
    "PointnetSAModuleVotes",
    "Pointnet2Backbone",
    "PositionEmbeddingLearned",
    "QueryAndGroup",
    "SharedMLP",
]
