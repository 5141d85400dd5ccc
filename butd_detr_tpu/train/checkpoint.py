"""Checkpoint save/load via orbax.

Reference parity (main_utils.py:122-160): checkpoints carry
{model, optimizer, scheduler, epoch}; `save_freq`-epoch cadence; restore
sets `start_epoch`; `--reduce_lr` skips optimizer/schedule restore for
manual LR drops. Our schedule is a pure function of the step count, so
"scheduler state" is just the step; `reduce_lr` therefore restores params
only.
"""

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from butd_detr_tpu.train.step import TrainState


def _ckpt_dir(log_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(log_dir), f"ckpt_epoch_{epoch}")


def save_checkpoint(log_dir: str, epoch: int, state: TrainState) -> str:
    """Write `log_dir/ckpt_epoch_{E}` (reference save_checkpoint,
    main_utils.py:144-160)."""
    path = _ckpt_dir(log_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "state": jax.device_get(state),
        "epoch": np.asarray(epoch),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(
    path: str, state: TrainState, reduce_lr: bool = False
):
    """Restore a TrainState; returns (state, start_epoch).

    With `reduce_lr` only the params/batch_stats are restored
    (main_utils.py:122-141 semantics: optimizer/scheduler skipped).
    """
    ckptr = ocp.StandardCheckpointer()
    target = {"state": jax.device_get(state), "epoch": np.asarray(0)}
    restored = ckptr.restore(path, target=target)
    rs = restored["state"]
    epoch = int(restored["epoch"])
    if reduce_lr:
        state = state.replace(params=rs.params, batch_stats=rs.batch_stats)
    else:
        state = rs
    return state, epoch + 1


def latest_checkpoint(log_dir: str) -> Optional[str]:
    if not os.path.isdir(log_dir):
        return None
    cands = [
        d for d in os.listdir(log_dir) if d.startswith("ckpt_epoch_")
    ]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("_")[-1]))
    return os.path.join(os.path.abspath(log_dir), best)
