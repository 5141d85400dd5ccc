"""Parallelism: mesh construction and sharding helpers."""

from butd_detr_tpu.parallel.mesh import (
    batch_sharding,
    commit_replicated,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "commit_replicated",
    "make_mesh",
    "replicated",
    "shard_batch",
]
