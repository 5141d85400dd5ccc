"""Multi-host helpers.

The reference merges evaluator dicts across ranks with a pickled NCCL
all_gather (utils/misc.py:23-63). On TPU the natural equivalent is a
host-side numeric allreduce over the JAX process group
(`multihost_utils.process_allgather`); single-process runs are a no-op.
"""

from typing import Dict

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def allreduce_dict(d: Dict) -> Dict:
    """Sum dict values (python/numpy scalars) across all JAX processes.

    Keys must be identical on every process (they are: evaluator
    accumulators are constructed from static config). Replaces the
    reference's pickle all_gather + rank-0 merge
    (src/grounding_evaluator.py:80-97)."""
    if jax.process_count() == 1:
        return dict(d)
    from jax.experimental import multihost_utils

    keys = sorted(d.keys(), key=repr)
    vec = np.asarray([float(d[k]) for k in keys], np.float64)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}
