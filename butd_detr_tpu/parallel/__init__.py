"""Parallelism: mesh construction and sharding helpers."""

from butd_detr_tpu.parallel.mesh import (
    batch_sharding,
    commit_replicated,
    make_mesh,
    replicated,
    shard_batch,
)
from butd_detr_tpu.parallel.tp import (
    commit_tp,
    param_pspec,
    shard_train_step_tp,
    state_shardings,
)

__all__ = [
    "batch_sharding",
    "commit_replicated",
    "commit_tp",
    "make_mesh",
    "param_pspec",
    "replicated",
    "shard_batch",
    "shard_train_step_tp",
    "state_shardings",
]
