"""Cross-cutting utilities: logging, multi-process helpers."""

from butd_detr_tpu.utils.dist import (
    allreduce_dict,
    is_main_process,
    process_count,
    process_index,
)
from butd_detr_tpu.utils.logging import setup_logger

__all__ = [
    "allreduce_dict",
    "is_main_process",
    "process_count",
    "process_index",
    "setup_logger",
]
