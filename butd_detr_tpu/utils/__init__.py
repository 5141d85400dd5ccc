"""Cross-cutting utilities: logging, multi-process helpers."""

from butd_detr_tpu.utils.dist import (
    allreduce_dict,
    is_main_process,
    process_count,
    process_index,
)
from butd_detr_tpu.utils.logging import setup_logger
from butd_detr_tpu.utils.visualize import scene_to_wandb_object, visualize_scene

__all__ = [
    "allreduce_dict",
    "is_main_process",
    "process_count",
    "process_index",
    "scene_to_wandb_object",
    "setup_logger",
    "visualize_scene",
]
