"""Data pipeline: ScanNet scan loading, grounding datasets, augmentation,
batching. Rebuilds reference src/joint_det_dataset.py,
src/visual_data_handlers.py, data/model_util_scannet.py."""

from butd_detr_tpu.data.augment import (
    MEAN_RGB,
    augment_pointcloud,
    box2points,
    corrupt_detected_boxes,
    points2box,
    rot_x,
    rot_y,
    rot_z,
    transform_boxes,
)
from butd_detr_tpu.data.joint_dataset import (
    MAX_NUM_OBJ,
    NUM_CLASSES,
    JointGroundingDataset,
)
from butd_detr_tpu.data.loader import DataLoader, collate
from butd_detr_tpu.data.positive_map import (
    find_char_spans,
    get_positive_map,
    normalize_caption,
    token_positive_map,
)
from butd_detr_tpu.data.scan import (
    Scan,
    ScanNetMappings,
    load_scan_cache,
    read_ply,
    save_scan_cache,
)
from butd_detr_tpu.data.scannet_config import (
    ScannetDatasetConfig,
    find_rel,
    is_view_dep,
    read_label_mapping,
    scannet_classes,
    valid_test_classes_485,
    view_dep_rels,
)
from butd_detr_tpu.data.synthetic import synthetic_batch

__all__ = [
    "DataLoader",
    "JointGroundingDataset",
    "MAX_NUM_OBJ",
    "MEAN_RGB",
    "NUM_CLASSES",
    "Scan",
    "ScanNetMappings",
    "ScannetDatasetConfig",
    "augment_pointcloud",
    "box2points",
    "collate",
    "corrupt_detected_boxes",
    "find_char_spans",
    "find_rel",
    "get_positive_map",
    "is_view_dep",
    "load_scan_cache",
    "normalize_caption",
    "points2box",
    "read_label_mapping",
    "read_ply",
    "rot_x",
    "rot_y",
    "rot_z",
    "save_scan_cache",
    "scannet_classes",
    "synthetic_batch",
    "token_positive_map",
    "transform_boxes",
    "valid_test_classes_485",
    "view_dep_rels",
]
