"""Shared MLP blocks (the reference's 1x1-conv stacks, TPU-idiomatic).

The reference builds `SharedMLP` from 1x1 Conv2d+BN+ReLU over a channels-
first `(B, C, npoint, nsample)` layout (pointnet2/pytorch_utils.py:11-36).
A 1x1 conv over points IS a dense layer applied pointwise, so here it is a
`nn.Dense` stack over channels-last `(..., C)` — which XLA maps straight
onto the MXU with C on the lane axis, no layout shuffles.

BatchNorm parity: torch BN momentum 0.1 (models/bdetr.py:321-325) ==
flax momentum 0.9 (flax keeps the decay of the running average), eps 1e-5,
per-device (non-synced) statistics, matching the reference's absence of
SyncBN. Conv weights use He-normal init like `pytorch_utils._ConvBase`'s
kaiming init (pytorch_utils.py:67-135); conv bias is dropped when BN
follows, as there.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

HE_NORMAL = nn.initializers.he_normal()

# torch BatchNorm defaults: eps=1e-5; momentum 0.1 (torch) == 0.9 (flax).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class SharedMLP(nn.Module):
    """Pointwise MLP: Dense(+BN)+ReLU per layer, applied over trailing dim.

    Equivalent to reference `pt_utils.SharedMLP` (pytorch_utils.py:11-36)
    in channels-last layout. Works on inputs of any rank `(..., C_in)`.
    """

    channels: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for c in self.channels:
            x = nn.Dense(
                c,
                use_bias=not self.bn,
                kernel_init=HE_NORMAL,
                dtype=self.dtype,
            )(x)
            if self.bn:
                # dtype here sets only the OUTPUT dtype: flax computes the
                # mean/var in f32 regardless (normalization._compute_stats),
                # and scale/bias params stay f32 (param_dtype default). In
                # bf16 mode the normalized activations — the big grouped
                # (B, npoint, nsample, C) intermediates — stay bf16, which
                # is the entire HBM-traffic point of backbone_bf16.
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=BN_MOMENTUM,
                    epsilon=BN_EPS,
                    dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return x


class ConvBNRelu1d(nn.Module):
    """Single pointwise Dense+BN+ReLU over (B, N, C) — reference
    `pt_utils.Conv1d` with bn=True (pytorch_utils.py:170-227)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dense(
            self.features, use_bias=False, kernel_init=HE_NORMAL,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype,
        )(x)
        return nn.relu(x)


class BNMomentumScheduler:
    """Epoch-indexed BatchNorm-momentum schedule.

    Functional analogue of reference pytorch_utils.BNMomentumScheduler
    (:271-296): torch mutates module attributes in place; in flax the
    momentum is a hyperparameter of the jitted step, so this object just
    evaluates `bn_lambda(epoch)` and the caller rebinds the model/step when
    the value changes (momentum enters BatchNorm as `1 - momentum` decay).
    Unused by BeaUTyDETR training (the reference only sets momentum 0.1
    once, bdetr.py:321-325); provided for parity.
    """

    def __init__(self, bn_lambda, last_epoch: int = -1):
        self.lmbd = bn_lambda
        self.last_epoch = last_epoch

    def step(self, epoch=None) -> float:
        if epoch is None:
            epoch = self.last_epoch + 1
        self.last_epoch = epoch
        return float(self.lmbd(epoch))

    @property
    def momentum(self) -> float:
        return float(self.lmbd(max(self.last_epoch, 0)))
