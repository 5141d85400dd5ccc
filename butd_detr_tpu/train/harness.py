"""Train/eval harness: dataset construction, epoch loops, evaluation.

Rebuild of reference `main_utils.py:286-494` (BaseTrainTester) and
`train_dist_mod.py:31-278` (TrainTester). Differences (TPU-first):

  * ONE jitted train step (forward + on-device Hungarian loss + grads +
    clip + AdamW) over the dp mesh replaces forward/backward/DDP/step;
  * evaluation end_points feed the vectorized GroundingEvaluator kernels
    (all prefixes at once) instead of per-prefix python loops;
  * detection eval projects soft-token scores to 19 classes with a
    token map computed FROM the tokenizer (the reference hardcodes the
    wordidx/tokenidx tables for RoBERTa, train_dist_mod.py:206-218);
  * checkpointing via orbax (train/checkpoint.py).
"""

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from butd_detr_tpu.data import DataLoader, JointGroundingDataset
from butd_detr_tpu.data.positive_map import normalize_caption
from butd_detr_tpu.data.scannet_config import ScannetDatasetConfig
from butd_detr_tpu.eval import (
    APCalculator,
    GroundingEvaluator,
    GroundingGTEvaluator,
    default_parse_config,
    parse_groundtruths,
    parse_predictions,
)
from butd_detr_tpu.parallel import (
    commit_replicated,
    make_mesh,
    shard_batch,
)
from butd_detr_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from butd_detr_tpu.train.config import Config
from butd_detr_tpu.train.optimizer import make_optimizer
from butd_detr_tpu.train.step import (
    INPUT_KEYS,
    METRIC_KEYS,
    TARGET_KEYS,
    build_model,
    init_state,
    make_eval_step,
    make_train_step,
    shard_eval_step,
    shard_train_step,
)
from butd_detr_tpu.utils import setup_logger

DET18_PROMPT_NAMES = (
    "cabinet", "bed", "chair", "couch", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "other furniture",
)


def detection_token_map(tokenizer) -> Tuple[np.ndarray, np.ndarray]:
    """(wordidx, tokenidx): which token positions of the fixed 18-class
    detection prompt vote for which class (18 = the classes, plus bin 0
    for no-object). Computed from the tokenizer's char_to_token — for HF
    RoBERTa this reproduces the reference's hardcoded tables
    (train_dist_mod.py:206-218)."""
    prompt = " . ".join(DET18_PROMPT_NAMES) + " . not mentioned"
    caption = normalize_caption(prompt)
    tok = tokenizer([caption], max_len=256)
    wordidx, tokenidx = [], []
    cursor = 0
    for w, name in enumerate(list(DET18_PROMPT_NAMES) + ["not mentioned"]):
        start = caption.index(name, cursor)
        cursor = start + len(name)
        toks = set()
        for ci in range(start, start + len(name)):
            t = tok.char_to_token(0, ci)
            if t is not None:
                toks.add(t)
        for t in sorted(toks):
            wordidx.append(0 if name == "not mentioned" else w + 1)
            tokenidx.append(t)
    # class ids: reference maps prompt word w -> class w (cabinet=0 ...),
    # with 'not mentioned' -> 0-bin handled by wordidx 0 there; we emit
    # (class+1) and shift so callers get exact 19-way projection
    return np.asarray(wordidx), np.asarray(tokenidx)


class TrainTester:
    """End-to-end harness. `main()` mirrors BaseTrainTester.main
    (main_utils.py:286-359)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        os.makedirs(cfg.log_dir, exist_ok=True)
        self.logger = setup_logger(
            output=cfg.log_dir, distributed_rank=jax.process_index()
        )
        with open(os.path.join(cfg.log_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    # ---------------- datasets / loaders ----------------

    def get_datasets(self):
        """train_dist_mod.py:38-74."""
        cfg = self.cfg
        dataset_dict = {d: 1 for d in cfg.dataset}
        if cfg.joint_det:
            dataset_dict["scannet"] = 10
        self.logger.info(f"Loading datasets: {sorted(dataset_dict)}")
        common = dict(
            test_dataset=cfg.test_dataset,
            data_path=cfg.data_root,
            use_color=cfg.use_color,
            use_height=cfg.use_height,
            use_multiview=cfg.use_multiview,
            detect_intermediate=cfg.detect_intermediate,
            butd=cfg.butd,
            butd_gt=cfg.butd_gt,
            butd_cls=cfg.butd_cls,
            overfit=cfg.debug,
            max_text_len=cfg.max_text_len,
            max_num_obj=cfg.max_num_obj,
            max_det_boxes=cfg.max_det_boxes,
            spatial_sort=cfg.spatial_sort,
        )
        train_dataset = JointGroundingDataset(
            dataset_dict=dataset_dict,
            split="train" if not cfg.debug else "val",
            augment_det=cfg.augment_det,
            **common,
        )
        test_dataset = JointGroundingDataset(
            dataset_dict=dataset_dict,
            split="val" if not cfg.eval_train else "train",
            scans=train_dataset.scans if cfg.debug or cfg.eval_train
            else None,
            tokenizer=train_dataset.tokenizer,
            **common,
        )
        return train_dataset, test_dataset

    def get_loaders(self):
        cfg = self.cfg
        train_dataset, test_dataset = self.get_datasets()
        kw = dict(
            batch_size=cfg.batch_size,
            seed=cfg.rng_seed,
            num_workers=cfg.num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        train_loader = DataLoader(train_dataset, shuffle=True, **kw)
        test_loader = DataLoader(
            test_dataset, shuffle=False, drop_last=False, **kw
        )
        return train_loader, test_loader

    # ---------------- model / steps ----------------

    def get_model(self):
        roberta = self._roberta_config()
        return build_model(self.cfg, roberta_config=roberta)

    def _roberta_config(self):
        from butd_detr_tpu.lang import roberta_base_config

        return roberta_base_config()

    def init_pretrained(self, state):
        """From-scratch initialization from pretrained sources, matching
        the reference (bdetr.py:60-94): frozen roberta-base trunk,
        GroupFree PointNet++ via --pp_checkpoint, class_embeddings3d.npy
        table. A later checkpoint restore overwrites all of this (same as
        the reference's load order, main_utils.py:286-330)."""
        from butd_detr_tpu.train.pretrained import apply_pretrained_init

        state, _ = apply_pretrained_init(
            state, self.cfg, logger=self.logger,
            roberta_config=self._roberta_config(),
        )
        return state

    def prefixes(self) -> List[str]:
        cfg = self.cfg
        if cfg.num_decoder_layers > 0:
            return (
                ["last_", "proposal_"]
                + [f"{i}head_" for i in range(cfg.num_decoder_layers - 1)]
            )
        return ["proposal_"]

    # ---------------- main ----------------

    def main(self):
        cfg = self.cfg
        train_loader, test_loader = self.get_loaders()
        self.logger.info(
            f"lengths: train {len(train_loader.dataset)}, "
            f"test {len(test_loader.dataset)}"
        )
        mesh = make_mesh(dp=cfg.dp, mp=cfg.mp)
        if cfg.syncbn:
            # BN stats already reduce over the global dp-sharded batch
            # axis under the pjit step (SyncBN inherent — train/step.py)
            self.logger.info(
                "--syncbn: BatchNorm statistics are global under the "
                "pjit train step; cross-replica sync is inherent"
            )
        model = self.get_model()
        optimizer = make_optimizer(cfg, steps_per_epoch=len(train_loader))

        rng = jax.random.PRNGKey(cfg.rng_seed)
        sample = next(iter(test_loader if cfg.eval else train_loader))
        t0 = time.time()
        state = init_state(model, optimizer, sample, rng)
        self.logger.info(f"init_state: {time.time() - t0:.1f}s")
        state = self.init_pretrained(state)
        if cfg.mp > 1:
            # tensor-parallel: Megatron-style column/row sharding of the
            # transformer stack over the mesh's mp axis (parallel/tp.py);
            # params, optimizer moments, and both steps share the tp
            # layout so every call reuses one executable
            from butd_detr_tpu.parallel import commit_tp, state_shardings

            state = commit_tp(mesh, state)
            ss = state_shardings(mesh, state)
            self.logger.info(
                f"--mp {cfg.mp}: transformer params tensor-sharded over "
                f"the mp axis (dp={mesh.shape['dp']}, mp={mesh.shape['mp']})"
            )
            train_step = shard_train_step(
                make_train_step(model, cfg, optimizer), mesh,
                state_shardings=ss,
            )
            eval_step = shard_eval_step(
                make_eval_step(model, cfg, with_loss=not cfg.butd_cls),
                mesh, state_shardings=ss,
            )
        else:
            # commit to the mesh's replicated sharding so every train/eval
            # call shares one executable (parallel/mesh.commit_replicated)
            state = commit_replicated(mesh, state)
            train_step = shard_train_step(
                make_train_step(model, cfg, optimizer), mesh
            )
            eval_step = shard_eval_step(
                make_eval_step(model, cfg, with_loss=not cfg.butd_cls), mesh
            )

        start_epoch = cfg.start_epoch
        ckpt = cfg.checkpoint_path or (
            latest_checkpoint(cfg.log_dir) if not cfg.eval else None
        )
        if ckpt:
            state, start_epoch = load_checkpoint(
                ckpt, state, reduce_lr=cfg.reduce_lr
            )
            self.logger.info(f"restored {ckpt}; start_epoch={start_epoch}")

        if cfg.eval:
            self.evaluate_one_epoch(start_epoch, test_loader, eval_step,
                                    state, mesh)
            return state

        for epoch in range(start_epoch, cfg.max_epoch + 1):
            train_loader.set_epoch(epoch)
            tic = time.time()
            state = self.train_one_epoch(
                epoch, train_loader, train_step, state, mesh, rng
            )
            self.logger.info(
                f"epoch {epoch}, total time {time.time() - tic:.2f}"
            )
            if epoch % cfg.val_freq == 0:
                if jax.process_index() == 0:
                    save_checkpoint(cfg.log_dir, epoch, state)
                self.evaluate_one_epoch(
                    epoch, test_loader, eval_step, state, mesh
                )

        if jax.process_index() == 0:
            path = save_checkpoint(cfg.log_dir, cfg.max_epoch, state)
            self.logger.info(f"saved {path}")
        self.evaluate_one_epoch(
            cfg.max_epoch, test_loader, eval_step, state, mesh
        )
        return state

    # ---------------- loops ----------------

    def train_one_epoch(self, epoch, train_loader, train_step, state,
                        mesh, rng):
        """main_utils.py:401-456, as a jitted-step loop."""
        cfg = self.cfg
        stat: Dict[str, float] = {}
        count = 0
        # profiler window: trace `profile_steps` steady-state steps (skip
        # step 0, which includes compilation, unless the epoch has only
        # one batch), once per run
        profile_at = (
            min(1, len(train_loader) - 1)
            if (cfg.profile_dir and not getattr(self, "_profiled", False))
            else None
        )
        tracing = False
        for batch_idx, batch in enumerate(train_loader):
            if profile_at is not None and batch_idx == profile_at:
                jax.profiler.start_trace(cfg.profile_dir)
                tracing = True
            sbatch = shard_batch(
                mesh, {k: batch[k] for k in (*INPUT_KEYS, *TARGET_KEYS)}
            )
            state, metrics = train_step(state, sbatch, rng)
            if (
                tracing
                and batch_idx >= profile_at + cfg.profile_steps - 1
            ):
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics
                )
                jax.profiler.stop_trace()
                tracing = False
                self._profiled = True
                profile_at = None
                self.logger.info(
                    f"profiler trace ({cfg.profile_steps} steps) written "
                    f"to {cfg.profile_dir}"
                )
            count += 1
            if (batch_idx + 1) % cfg.print_freq == 0:
                metrics = jax.device_get(metrics)  # sync once per window
                for k, v in metrics.items():
                    stat[k] = stat.get(k, 0.0) + float(v)
                self.logger.info(
                    f"Train: [{epoch}][{batch_idx + 1}/{len(train_loader)}] "
                    + " ".join(
                        f"{k} {v:.4f}" for k, v in sorted(stat.items())
                    )
                )
                stat = {}
        if tracing:  # epoch shorter than the profile window
            jax.profiler.stop_trace()
            self._profiled = True
        return state

    def _eval_batches(self, test_loader, eval_step, state, mesh):
        """Yield (batch, end_points) for every eval batch, accumulating and
        logging running-mean loss stats per print_freq window as the
        reference's `_main_eval_branch` does (main_utils.py:458-494)."""
        stat: Dict[str, float] = {}
        wsum = 0.0
        n = len(test_loader)
        B = self.cfg.batch_size
        for batch_idx, batch in enumerate(test_loader):
            # drop_last=False tail batches are padded to the fixed shape
            # by cyclic repetition (data/loader.py); only the first
            # `valid` rows are real samples
            valid = batch.pop("__valid__", B)
            sbatch = shard_batch(
                mesh,
                {
                    k: batch[k]
                    for k in (*INPUT_KEYS, *TARGET_KEYS)
                    if k in batch
                },
            )
            end_points = eval_step(state, sbatch)
            loss_keys = [k for k in METRIC_KEYS if k in end_points]
            if loss_keys:
                # the evaluator pulls end_points to host right after this
                # yield anyway, so a per-batch scalar device_get is free
                vals = jax.device_get({k: end_points[k] for k in loss_keys})
                # tail batches are padded by cyclic repetition; their loss
                # scalars are means over the FULL padded batch, so weight
                # by valid/B to keep the running mean per-REAL-sample
                # (matches the reference's per-sample stats; ADVICE r3)
                w = valid / B
                wsum += w
                for k, v in vals.items():
                    stat[k] = stat.get(k, 0.0) + float(v) * w
                if (batch_idx + 1) % self.cfg.print_freq == 0:
                    self.logger.info(
                        f"Eval: [{batch_idx + 1}/{n}] " + " ".join(
                            f"{k} {v / wsum:.4f}"
                            for k, v in sorted(stat.items())
                        )
                    )
            # evaluator extras stay on host
            for k in (
                "all_bboxes", "all_bbox_label_mask", "is_view_dep",
                "is_hard", "is_unique", "sem_cls_label", "box_label_mask",
                "center_label", "size_gts", "positive_map", "point_clouds",
            ):
                if k in batch:
                    end_points[k] = batch[k]
            if valid < B:
                # truncate padded duplicate rows so evaluator counters
                # count each real sample exactly once
                end_points = {
                    k: v[:valid]
                    if (hasattr(v, "ndim") and v.ndim >= 1
                        and v.shape[0] == B)
                    or (isinstance(v, list) and len(v) == B)
                    else v
                    for k, v in end_points.items()
                }
            yield batch, end_points

    def evaluate_one_epoch(self, epoch, test_loader, eval_step, state,
                           mesh):
        """Grounding eval (train_dist_mod.py:112-159) or detection eval
        when testing on scannet (:161-278)."""
        cfg = self.cfg
        if cfg.test_dataset == "scannet":
            return self.evaluate_one_epoch_det(
                epoch, test_loader, eval_step, state, mesh
            )
        prefixes = self.prefixes()
        if cfg.butd_cls or cfg.butd_gt:
            evaluator = GroundingGTEvaluator(
                prefixes=prefixes, logger=self.logger,
                with_contrast=cfg.use_contrastive_align,
            )
        else:
            evaluator = GroundingEvaluator(
                only_root=True, thresholds=(0.25, 0.5), topks=(1, 5, 10),
                prefixes=prefixes, logger=self.logger,
                with_contrast=cfg.use_contrastive_align,
            )
        for _, end_points in self._eval_batches(
            test_loader, eval_step, state, mesh
        ):
            evaluator.evaluate(end_points)
        evaluator.synchronize_between_processes()
        if jax.process_index() == 0:
            evaluator.print_stats()
        return evaluator

    def evaluate_one_epoch_det(self, epoch, test_loader, eval_step, state,
                               mesh):
        """Detection mAP on the scannet prompt (train_dist_mod.py:161-278):
        contrastive scores -> 256-bin -> 19-class projection -> NMS -> AP."""
        cfg = self.cfg
        dc18 = ScannetDatasetConfig(18)
        parse_cfg = default_parse_config(dataset_num_class=dc18.num_class)
        wordidx, tokenidx = detection_token_map(
            test_loader.dataset.tokenizer
        )
        calculators = [
            APCalculator(t, dc18.class2type) for t in cfg.ap_iou_thresholds
        ]
        for _, end_points in self._eval_batches(
            test_loader, eval_step, state, mesh
        ):
            ep = {k: np.asarray(v) for k, v in end_points.items()
                  if not isinstance(v, (list, str))}
            # contrastive similarities as 256-bin scores
            sim = np.einsum(
                "bqd,btd->bqt",
                np.asarray(ep["last_proj_queries"], np.float32),
                np.asarray(ep["proj_tokens"], np.float32),
            ) / 0.07
            scores = np.zeros(sim.shape[:2] + (256,), np.float32)
            scores[:, :, : sim.shape[-1]] = sim
            # token -> 19-class projection (bin 18 collects 'not mentioned')
            sem = np.zeros(sim.shape[:2] + (19,), np.float32)
            for w, t in zip(wordidx, tokenidx):
                cls = 18 if w == 0 else w - 1
                sem[..., cls] += scores[..., t]
            ep["last_sem_cls_scores"] = sem
            preds = parse_predictions(ep, parse_cfg, "last_")
            gts = parse_groundtruths(ep)
            for calc in calculators:
                calc.step(preds, gts)
        results = {}
        for t, calc in zip(cfg.ap_iou_thresholds, calculators):
            metrics = calc.compute_metrics()
            self.logger.info(f"=====> last_ IOU THRESH: {t} <=====")
            self.logger.info(
                f"mAP {metrics['mAP']:.4f} AR {metrics['AR']:.4f}"
            )
            results[t] = metrics
        return results
