"""Device mesh construction and sharding rules.

The reference's only parallelism is DDP data-parallel over NCCL
(main_utils.py:310-313, SURVEY.md section 2.3). The TPU-native equivalent:
a (dp, mp) `jax.sharding.Mesh`, batch arrays sharded over `dp`, params
replicated (mp=1 by default — the model is 288-d; an mp axis is exposed for
headroom but unused by default). Gradient averaging is implicit in pjit's
global-array semantics; the evaluator merge uses host-side allgather
(see eval/). No NCCL-style explicit collectives are needed.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    mp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, mp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
        dp = n // mp
    assert dp * mp <= n, f"dp({dp}) * mp({mp}) > devices({n})"
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def commit_replicated(mesh: Mesh, tree):
    """Commit a pytree (e.g. a fresh TrainState) to the replicated sharding.

    `init_state` builds arrays with default (single-device) placement; the
    first `shard_train_step` call then compiles an executable for THAT
    input sharding, and the second call — whose input is the properly
    replicated output state — compiles a SECOND executable. Committing the
    state up front makes every call share one executable (measured: the
    duplicate train-step compile is minutes on TPU and ~90 s on the CPU
    test mesh)."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
