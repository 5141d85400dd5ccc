"""Evaluation: grounding accuracy (on-device, vectorized) + detection mAP
(host numpy cold path). Rebuilds reference src/grounding_evaluator.py,
models/ap_helper.py, utils/{eval_det,nms,box_util}.py."""

from butd_detr_tpu.eval.box_util import (
    aabb_iou,
    box3d_iou,
    box3d_vol,
    corners_to_aabb,
    flip_axis_to_camera,
    flip_axis_to_depth,
    get_3d_box,
    get_3d_box_batch,
    get_iou_obb,
)
from butd_detr_tpu.eval.detection import (
    APCalculator,
    default_parse_config,
    eval_det,
    eval_det_cls,
    eval_grounding,
    parse_groundtruths,
    parse_predictions,
    voc_ap,
)
from butd_detr_tpu.eval.metrics import (
    calc_iou,
    multi_scene_precision_recall,
    precision_recall,
    single_scene_precision_recall,
)
from butd_detr_tpu.eval.grounding import (
    GroundingEvaluator,
    GroundingGTEvaluator,
    grounding_batch_hits,
    gt_grounding_batch_hits,
)
from butd_detr_tpu.eval.nms import (
    nms_2d_faster,
    nms_3d_faster,
    nms_3d_faster_samecls,
)

__all__ = [
    "APCalculator",
    "GroundingEvaluator",
    "GroundingGTEvaluator",
    "aabb_iou",
    "box3d_iou",
    "box3d_vol",
    "calc_iou",
    "corners_to_aabb",
    "default_parse_config",
    "eval_det",
    "eval_det_cls",
    "eval_grounding",
    "flip_axis_to_camera",
    "flip_axis_to_depth",
    "get_3d_box",
    "get_3d_box_batch",
    "get_iou_obb",
    "grounding_batch_hits",
    "gt_grounding_batch_hits",
    "multi_scene_precision_recall",
    "precision_recall",
    "single_scene_precision_recall",
    "nms_2d_faster",
    "nms_3d_faster",
    "nms_3d_faster_samecls",
    "parse_groundtruths",
    "parse_predictions",
    "voc_ap",
]
