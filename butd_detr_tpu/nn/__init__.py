"""NN building blocks: shared MLPs, PointNet++ modules, the visual backbone."""

from butd_detr_tpu.nn.backbone import Pointnet2Backbone
from butd_detr_tpu.nn.mlp import ConvBNRelu1d, SharedMLP
from butd_detr_tpu.nn.pointnet2 import (
    PointnetFPModule,
    PointnetSAModuleVotes,
    QueryAndGroup,
)
from butd_detr_tpu.nn.position import PositionEmbeddingLearned

__all__ = [
    "ConvBNRelu1d",
    "PointnetFPModule",
    "PointnetSAModuleVotes",
    "Pointnet2Backbone",
    "PositionEmbeddingLearned",
    "QueryAndGroup",
    "SharedMLP",
]
