"""Jitted train/eval steps over the dp mesh.

The reference's hot loop (SURVEY.md 3.2) is: H2D copy -> forward -> CPU
Hungarian -> backward -> DDP all-reduce -> clip -> step. Here the whole
thing — forward, on-device matching, loss, grads, clip, optimizer — is ONE
XLA program under `jax.jit` with batch arrays sharded over the `dp` mesh
axis; gradient averaging falls out of global-array semantics (no NCCL-style
code). BatchNorm statistics are likewise GLOBAL: the batch mean/var reduce
over the dp-sharded batch axis, so XLA inserts the cross-replica collective
and batch_stats see the full global batch — i.e. SyncBN semantics are
always on (verified by tests/test_harness.py::test_bn_stats_are_global).
The reference's `--syncbn` (main_utils.py SyncBN wrap) is therefore
inherently satisfied; the flag is accepted and logged as a no-op. (The
reference's launch scripts never set it, so it trains per-GPU BN — our
global stats are the strictly-more-correct variant and identical at
process_count()==1.)
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from butd_detr_tpu.losses import CriterionConfig, compute_hungarian_loss
from butd_detr_tpu.models import BeaUTyDETR
from butd_detr_tpu.parallel.mesh import batch_sharding, replicated
from butd_detr_tpu.train.config import Config

# GT keys the criterion reads from the batch (joint_det_dataset __getitem__)
TARGET_KEYS = (
    "center_label",
    "size_gts",
    "sem_cls_label",
    "positive_map",
    "box_label_mask",
    "point_instance_label",
    "text_mask",
)

# model input keys
INPUT_KEYS = (
    "point_clouds",
    "text_ids",
    "text_mask",
    "det_boxes",
    "det_class_ids",
    "det_bbox_label_mask",
)

METRIC_KEYS = (
    "loss",
    "loss_ce",
    "loss_bbox",
    "loss_giou",
    "loss_contrastive_align",
    "query_points_generation_loss",
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_model(cfg: Config, roberta_config=None,
                backbone_npoints=(2048, 1024, 512, 256)) -> BeaUTyDETR:
    """Model-from-config (reference train_dist_mod.get_model, :76-100)."""
    import jax.numpy as jnp  # noqa: F811

    return BeaUTyDETR(
        num_class=256,
        num_obj_class=485,
        input_feature_dim=3 + cfg.input_feature_dim,
        num_queries=cfg.num_target,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        self_position_embedding=cfg.self_position_embedding,
        contrastive_align_loss=cfg.use_contrastive_align,
        d_model=288,
        butd=cfg.butd or cfg.butd_gt or cfg.butd_cls,
        self_attend=cfg.self_attend,
        roberta=roberta_config,
        backbone_npoints=backbone_npoints,
        dtype=jnp.bfloat16 if cfg.use_bf16 else jnp.float32,
        backbone_dtype=jnp.bfloat16 if cfg.backbone_bf16 else None,
        freeze_text=cfg.freeze_text_encoder,
        input_presorted=cfg.spatial_sort,
        # False -> None keeps the documented BUTD_ATTN_PRECISE env A/B
        # knob working (process-start-only; see ops/pallas_attention.py)
        attn_precise=cfg.attn_precise or None,
    )


def criterion_config(cfg: Config) -> CriterionConfig:
    return CriterionConfig(
        eos_coef=cfg.eos_coef,
        temperature=0.07,
        cost_class=1.0,
        cost_bbox=0.0,
        cost_giou=2.0,
        use_contrastive_align=cfg.use_contrastive_align,
        use_soft_token=cfg.use_soft_token_loss,
    )


def init_state(
    model: BeaUTyDETR, optimizer, sample_batch, rng
) -> TrainState:
    inputs = {k: sample_batch[k] for k in INPUT_KEYS if k in sample_batch}
    # jit the init: eager flax init dispatches thousands of ops one by one
    # (tens of seconds on CPU, minutes over a TPU tunnel); as one compiled
    # graph it also lands in the persistent compile cache
    variables = jax.jit(model.init)(rng, inputs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )


def make_train_step(model: BeaUTyDETR, cfg: Config, optimizer):
    crit_cfg = criterion_config(cfg)

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(rng, state.step)
        inputs = {k: batch[k] for k in INPUT_KEYS if k in batch}

        def loss_fn(params):
            end_points, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            for k in TARGET_KEYS:
                end_points[k] = batch[k]
            loss, end_points = compute_hungarian_loss(
                end_points,
                cfg.num_decoder_layers,
                crit_cfg,
                cfg.query_points_obj_topk,
            )
            return loss, (end_points, mutated)

        (loss, (end_points, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            k: end_points[k] for k in METRIC_KEYS if k in end_points
        }
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=mutated["batch_stats"],
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model: BeaUTyDETR, cfg: Config, with_loss: bool = True):
    crit_cfg = criterion_config(cfg)

    def eval_step(state: TrainState, batch: Dict) -> Dict:
        inputs = {k: batch[k] for k in INPUT_KEYS if k in batch}
        end_points = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs,
            train=False,
        )
        for k in TARGET_KEYS:
            if k in batch:
                end_points[k] = batch[k]
        if with_loss:
            _, end_points = compute_hungarian_loss(
                end_points,
                cfg.num_decoder_layers,
                crit_cfg,
                cfg.query_points_obj_topk,
            )
        return end_points

    return eval_step


def shard_train_step(train_step, mesh, state_shardings=None):
    """jit the step with dp-sharded batch; state replicated by default,
    or laid out per `state_shardings` (parallel/tp.state_shardings) when
    the harness runs tensor-parallel (--mp)."""
    rep, shd = replicated(mesh), batch_sharding(mesh)
    ss = state_shardings if state_shardings is not None else rep
    return jax.jit(
        train_step,
        in_shardings=(ss, shd, rep),
        out_shardings=(ss, rep),
        donate_argnums=(0,),
    )


def shard_eval_step(eval_step, mesh, state_shardings=None):
    """jit the eval step with pinned output shardings: per-sample
    end_points stay batch-sharded on dp (so the evaluator's host pulls
    are deterministic slices, not whatever layout XLA picked), scalars
    replicated. `state_shardings` (a state-shaped tree of NamedShardings,
    parallel/tp.state_shardings) overrides the replicated state layout
    when the harness runs tensor-parallel (--mp)."""
    rep, shd = replicated(mesh), batch_sharding(mesh)
    ss = state_shardings if state_shardings is not None else rep
    dp_size = mesh.shape["dp"]

    def stepped(state, batch):
        out = eval_step(state, batch)
        return {
            k: jax.lax.with_sharding_constraint(
                v, shd if (hasattr(v, "ndim") and v.ndim >= 1
                           and v.shape[0] > 0
                           and v.shape[0] % dp_size == 0) else rep
            )
            for k, v in out.items()
        }

    return jax.jit(stepped, in_shardings=(ss, shd))
