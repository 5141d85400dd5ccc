"""Training harness: config, optimizer, jitted steps, checkpointing."""

from butd_detr_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from butd_detr_tpu.train.config import Config, parse_config
from butd_detr_tpu.train.harness import TrainTester, detection_token_map
from butd_detr_tpu.train.torch_convert import convert_torch_checkpoint
from butd_detr_tpu.train.optimizer import (
    make_optimizer,
    make_schedule,
    param_group_label,
)
from butd_detr_tpu.train.step import (
    INPUT_KEYS,
    METRIC_KEYS,
    TARGET_KEYS,
    TrainState,
    build_model,
    criterion_config,
    init_state,
    make_eval_step,
    make_train_step,
    shard_eval_step,
    shard_train_step,
)

__all__ = [
    "Config",
    "INPUT_KEYS",
    "METRIC_KEYS",
    "TARGET_KEYS",
    "TrainState",
    "TrainTester",
    "build_model",
    "detection_token_map",
    "criterion_config",
    "init_state",
    "latest_checkpoint",
    "load_checkpoint",
    "make_eval_step",
    "make_optimizer",
    "make_schedule",
    "make_train_step",
    "param_group_label",
    "parse_config",
    "save_checkpoint",
    "shard_eval_step",
    "shard_train_step",
]
