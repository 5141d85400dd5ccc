"""Losses: box math, on-device Hungarian matcher, set criterion."""

from butd_detr_tpu.losses.boxes import (
    box_cxcyczwhd_to_xyzxyz,
    box_volume,
    generalized_box_iou3d,
    matched_giou3d,
    matched_iou3d,
    pairwise_iou3d,
)
from butd_detr_tpu.losses.criterion import (
    CriterionConfig,
    compute_hungarian_loss,
    compute_points_obj_cls_loss_hard_topk,
    loss_boxes,
    loss_contrastive_align,
    loss_labels_st,
    set_criterion_losses,
    sigmoid_focal_loss,
)
from butd_detr_tpu.losses.matcher import (
    batched_linear_sum_assignment,
    hungarian_match,
    matcher_cost_matrix,
    scipy_match_oracle,
)

__all__ = [
    "CriterionConfig",
    "batched_linear_sum_assignment",
    "box_cxcyczwhd_to_xyzxyz",
    "box_volume",
    "compute_hungarian_loss",
    "compute_points_obj_cls_loss_hard_topk",
    "generalized_box_iou3d",
    "hungarian_match",
    "loss_boxes",
    "loss_contrastive_align",
    "loss_labels_st",
    "matched_giou3d",
    "matched_iou3d",
    "matcher_cost_matrix",
    "pairwise_iou3d",
    "scipy_match_oracle",
    "set_criterion_losses",
    "sigmoid_focal_loss",
]
