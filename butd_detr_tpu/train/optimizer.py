"""Optimizer + LR schedules: 3-group AdamW with warmup and step/cosine decay.

Rebuild of reference `main_utils.get_optimizer` (:255-284) and
`utils/lr_scheduler.py`:
  * param groups by name: backbone_net -> lr_backbone, text_encoder ->
    text_encoder_lr (zeroed when frozen), everything else -> lr;
  * global grad-norm clip 0.1 BEFORE the update (main_utils.py:432-437);
  * iteration-granularity schedules: MultiStep (gamma^milestones-crossed)
    or cosine-to-1e-6, optionally wrapped in the multiplier-100 gradual
    warmup (lr_scheduler.py:11-67): lr(t) = base/m * ((m-1)t/T + 1).
"""

from typing import Callable, List, Optional

import jax.numpy as jnp
import optax

from butd_detr_tpu.train.config import Config


def make_schedule(
    base_lr: float,
    steps_per_epoch: int,
    cfg: Config,
) -> Callable:
    """Per-step LR schedule matching get_scheduler (lr_scheduler.py:70-92)."""
    warmup_steps = max(cfg.warmup_epoch, 0) * steps_per_epoch

    if "cosine" in cfg.lr_scheduler:
        t_max = (cfg.max_epoch - max(cfg.warmup_epoch, 0)) * steps_per_epoch
        eta_min = 1e-6

        def after(step):
            frac = jnp.clip(step / jnp.maximum(t_max, 1), 0.0, 1.0)
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * frac)
            )

    elif "step" in cfg.lr_scheduler:
        milestones = jnp.asarray(
            [
                (m - max(cfg.warmup_epoch, 0)) * steps_per_epoch
                for m in cfg.lr_decay_epochs
            ],
            jnp.float32,
        )

        def after(step):
            crossed = jnp.sum(
                (step >= milestones).astype(jnp.float32)
            )
            return base_lr * cfg.lr_decay_rate**crossed

    else:
        raise NotImplementedError(cfg.lr_scheduler)

    if warmup_steps > 0:
        m = float(cfg.warmup_multiplier)

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm = base_lr / m * ((m - 1.0) * step / warmup_steps + 1.0)
            return jnp.where(
                step > warmup_steps, after(step - warmup_steps), warm
            )

        return schedule
    return lambda step: after(jnp.asarray(step, jnp.float32))


def param_group_label(path) -> str:
    """Label a param by its path: backbone / text / main (get_optimizer)."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if any("backbone_net" in str(k) for k in keys):
        return "backbone"
    if any("text_encoder" in str(k) for k in keys):
        return "text"
    return "main"


def make_optimizer(
    cfg: Config, steps_per_epoch: int, params=None
) -> optax.GradientTransformation:
    """Build the full optax chain. `params` is only used for tree labeling
    at init (multi_transform resolves labels lazily from the grads tree)."""

    def group(base_lr):
        return optax.adamw(
            learning_rate=make_schedule(base_lr, steps_per_epoch, cfg),
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
        )

    transforms = {
        "main": group(cfg.lr),
        "backbone": group(cfg.lr_backbone),
        "text": (
            optax.set_to_zero()
            if cfg.freeze_text_encoder
            else group(cfg.text_encoder_lr)
        ),
    }

    def labeler(tree):
        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: param_group_label(path), tree
        )

    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.multi_transform(transforms, labeler),
    )
