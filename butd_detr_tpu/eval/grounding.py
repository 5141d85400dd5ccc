"""Language-grounding evaluation, vectorized for TPU.

Rebuild of reference `src/grounding_evaluator.py` (GroundingEvaluator:17,
GroundingGTEvaluator:256). The reference loops over batch elements and GT
objects in Python on GPU tensors (grounding_evaluator.py:138-242); here the
whole per-batch computation is ONE masked, fixed-shape jnp program (jittable,
batched over B and K), and only small per-batch hit counters come back to
host. Cross-process merging uses a host-side pytree allgather
(utils/dist.py) instead of the reference's pickled NCCL all_gather
(utils/misc.py:23-63).

Two scoring modes per reference:
  - ``bbs`` box-by-span: softmaxed 256-way soft-token scores dotted with the
    GT positive map (grounding_evaluator.py:110-166).
  - ``bbf`` box-by-contrast: projected query/token 64-d features, similarity
    / 0.07 softmax over tokens (grounding_evaluator.py:168-242).
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from butd_detr_tpu.losses.boxes import (
    box_cxcyczwhd_to_xyzxyz,
    matched_iou3d,
    pairwise_iou3d,
)

BREAKDOWN_FIELDS = ("easy", "hard", "vd", "vid", "unique", "multi")


def _parse_gt(end_points, only_root: bool):
    """Binarized positive map + GT cxcyczwhd boxes + object mask.

    Mirrors reference grounding_evaluator.py:244-254: positive_map values
    >0 become 1; with only_root, keep just the first (root-noun) object.
    """
    pmap = (end_points["positive_map"] > 0).astype(jnp.float32)  # (B,K,T)
    gt = jnp.concatenate(
        [end_points["center_label"][..., :3], end_points["size_gts"]],
        axis=-1,
    )  # (B, K, 6) cxcyczwhd
    mask = end_points["box_label_mask"].astype(jnp.float32)  # (B, K)
    if only_root:
        pmap, gt, mask = pmap[:, :1], gt[:, :1], mask[:, :1]
    return pmap, gt, mask


def _pad_scores(scores, width: int):
    """Right-pad score last dim with zeros to the positive-map width
    (reference pads sem scores to 256, grounding_evaluator.py:124-129)."""
    t = scores.shape[-1]
    if t < width:
        scores = jnp.pad(
            scores, [(0, 0)] * (scores.ndim - 1) + [(0, width - t)]
        )
    return scores[..., :width]


def span_scores(end_points, prefix: str, width: int):
    """(B, Q, width) softmaxed soft-token scores."""
    s = jax.nn.softmax(
        end_points[f"{prefix}sem_cls_scores"].astype(jnp.float32), axis=-1
    )
    return _pad_scores(s, width)


def contrast_scores(end_points, prefix: str, width: int, temperature=0.07):
    """(B, Q, width) contrastive query-token scores (tokens softmax)."""
    sim = jnp.einsum(
        "bqd,btd->bqt",
        end_points[f"{prefix}proj_queries"].astype(jnp.float32),
        end_points["proj_tokens"].astype(jnp.float32),
    )
    return _pad_scores(jax.nn.softmax(sim / temperature, axis=-1), width)


def topk_box_hits(
    sem_scores,  # (B, Q, T) probabilities
    pred_bbox,  # (B, Q, 6) cxcyczwhd
    pmap,  # (B, K, T) binarized positive map
    gt_bboxes,  # (B, K, 6) cxcyczwhd
    thresholds: Sequence[float],
    topks: Sequence[int],
):
    """For each (sample, object): did any of the top-k-scoring predicted
    boxes reach IoU>t with the GT box? Returns (B, K, n_t, n_k) float hits.

    Vectorizes the reference per-sample loop at grounding_evaluator.py:
    138-166 (scores = sem_scores . pmap; argsort top-10; diagonal IoU).
    """
    kmax = max(topks)
    scores = jnp.einsum("bqt,bkt->bkq", sem_scores, pmap)  # (B,K,Q)
    _, top_idx = jax.lax.top_k(scores, kmax)  # (B,K,kmax)
    pb = jnp.take_along_axis(
        pred_bbox[:, None, :, :], top_idx[..., None], axis=2
    )  # (B,K,kmax,6)
    ious = matched_iou3d(
        box_cxcyczwhd_to_xyzxyz(gt_bboxes)[:, :, None, :],
        box_cxcyczwhd_to_xyzxyz(pb),
    )  # (B, K, kmax)
    hits = []
    for t in thresholds:
        over = ious > t  # (B,K,kmax)
        hits.append(
            jnp.stack(
                [over[..., :k].any(axis=-1) for k in topks], axis=-1
            )
        )
    return jnp.stack(hits, axis=2).astype(jnp.float32)  # (B,K,n_t,n_k)


def _pred_boxes(end_points, prefix):
    return jnp.concatenate(
        [
            end_points[f"{prefix}center"].astype(jnp.float32),
            end_points[f"{prefix}pred_size"].astype(jnp.float32),
        ],
        axis=-1,
    )


def grounding_batch_hits(
    end_points: Dict,
    prefixes: Sequence[str],
    thresholds: Sequence[float] = (0.25, 0.5),
    topks: Sequence[int] = (1, 5, 10),
    only_root: bool = True,
    width: int = 256,
    with_contrast: bool = True,
):
    """Jittable: all hit tensors for one batch.

    Returns dict with, per prefix and mode, hits (B, K, n_t, n_k), plus the
    object mask (B, K) and the root-object bbf top1@t0 hits (B,) used for
    the easy/hard/vd/vid/unique/multi breakdown (reference
    grounding_evaluator.py:216-242, last_ prefix only).
    """
    pmap, gt, mask = _parse_gt(end_points, only_root)
    out = {"mask": mask}
    for prefix in prefixes:
        pred = _pred_boxes(end_points, prefix)
        s = span_scores(end_points, prefix, width)
        out[prefix + "bbs"] = topk_box_hits(
            s, pred, pmap, gt, thresholds, topks
        )
        if with_contrast:
            c = contrast_scores(end_points, prefix, width)
            out[prefix + "bbf"] = topk_box_hits(
                c, pred, pmap, gt, thresholds, topks
            )
    if with_contrast and "last_" in prefixes:
        # root-object top-1 @ thresholds[0], bbf mode
        out["root_found"] = out["last_bbf"][:, 0, 0, 0]
    return out


class GroundingEvaluator:
    """Accumulates Top-{1,5,10} Acc@{0.25,0.5} per layer prefix, both modes,
    plus easy/hard/view-dep/unique breakdowns. Host-side accumulator around
    the jitted `grounding_batch_hits` kernel.

    API mirrors reference GroundingEvaluator (grounding_evaluator.py:17):
    evaluate(end_points) [all prefixes at once], synchronize_between_
    processes(), print_stats(), reset().
    """

    def __init__(
        self,
        only_root: bool = True,
        thresholds: Sequence[float] = (0.25, 0.5),
        topks: Sequence[int] = (1, 5, 10),
        prefixes: Sequence[str] = (),
        with_contrast: bool = True,
        logger=None,
    ):
        self.only_root = only_root
        self.thresholds = tuple(thresholds)
        self.topks = tuple(topks)
        self.prefixes = list(prefixes)
        self.with_contrast = with_contrast
        self.modes = ["bbs", "bbf"] if with_contrast else ["bbs"]
        self._log = logger.info if logger is not None else print
        self._kernel = jax.jit(
            lambda ep: grounding_batch_hits(
                ep,
                tuple(self.prefixes),
                self.thresholds,
                self.topks,
                only_root,
                with_contrast=with_contrast,
            )
        )
        self.reset()

    def reset(self):
        self.dets = {
            (p, t, k, m): 0.0
            for p in self.prefixes
            for t in self.thresholds
            for k in self.topks
            for m in self.modes
        }
        self.gts = dict(self.dets)
        for f in BREAKDOWN_FIELDS:
            self.dets[f] = 0.0
            self.gts[f] = 1e-14

    def evaluate(self, end_points: Dict):
        """end_points: device or numpy arrays for one batch (all prefixes)."""
        out = self._kernel(end_points)
        out = jax.tree_util.tree_map(np.asarray, out)
        mask = out["mask"]  # (B, K)
        n = mask.sum()
        for p in self.prefixes:
            for m in self.modes:
                hits = out[p + m]  # (B,K,n_t,n_k)
                for it, t in enumerate(self.thresholds):
                    for ik, k in enumerate(self.topks):
                        self.dets[(p, t, k, m)] += float(
                            (hits[:, :, it, ik] * mask).sum()
                        )
                        self.gts[(p, t, k, m)] += float(n)
        if "root_found" in out:
            self._breakdown(end_points, out["root_found"], mask[:, 0])

    def _breakdown(self, end_points, found, root_mask):
        flags = {
            "vd": "is_view_dep", "hard": "is_hard", "unique": "is_unique"
        }
        inverse = {"vd": "vid", "hard": "easy", "unique": "multi"}
        for field, key in flags.items():
            if key not in end_points:
                continue
            flag = np.asarray(end_points[key]).astype(bool)
            pos = flag * root_mask
            neg = (~flag) * root_mask
            self.dets[field] += float((found * pos).sum())
            self.gts[field] += float(pos.sum())
            self.dets[inverse[field]] += float((found * neg).sum())
            self.gts[inverse[field]] += float(neg.sum())

    def synchronize_between_processes(self):
        from butd_detr_tpu.utils.dist import allreduce_dict

        self.dets = allreduce_dict(self.dets)
        self.gts = allreduce_dict(self.gts)

    def accuracy(self, prefix: str, t: float, k: int, mode: str = "bbf"):
        return self.dets[(prefix, t, k, mode)] / max(
            self.gts[(prefix, t, k, mode)], 1
        )

    def print_stats(self):
        mode_str = {
            "bbs": "Box given span (soft-token)",
            "bbf": "Box given span (contrastive)",
        }
        for p in self.prefixes:
            for m in self.modes:
                for t in self.thresholds:
                    accs = ", ".join(
                        "Top-%d: %.3f" % (k, self.accuracy(p, t, k, m))
                        for k in self.topks
                    )
                    self._log(f"{p} {mode_str[m]} Acc{t:.2f}: {accs}")
        self._log("Analysis")
        for f in BREAKDOWN_FIELDS:
            self._log(f"{f} {self.dets[f] / self.gts[f]:.4f}")


def gt_grounding_batch_hits(
    end_points: Dict,
    prefixes: Sequence[str],
    width: int = 256,
    with_contrast: bool = True,
):
    """Jittable GT-box (cls setup) evaluation for one batch.

    Vectorizes reference GroundingGTEvaluator (grounding_evaluator.py:
    330-484): predictions are scored, suppressed where no scene GT box
    overlaps >0.25, then the top-1 prediction is snapped to the nearest
    scene GT box; a hit is exact equality with the root target box.
    Returns per-sample {prefix,mode} hit floats (B,) + 'root_found'.
    """
    pmap, gt, mask = _parse_gt(end_points, only_root=True)
    all_boxes = end_points["all_bboxes"].astype(jnp.float32)  # (B, M, 6)
    all_mask = end_points["all_bbox_label_mask"].astype(bool)  # (B, M)
    all_xyz = box_cxcyczwhd_to_xyzxyz(all_boxes)

    out = {}
    for prefix in prefixes:
        pred = _pred_boxes(end_points, prefix)  # (B, Q, 6)
        ious, _ = pairwise_iou3d(all_xyz, box_cxcyczwhd_to_xyzxyz(pred))
        ious = jnp.where(all_mask[:, :, None], ious, 0.0)  # (B, M, Q)
        is_correct = (ious.max(axis=1) > 0.25).astype(jnp.float32)  # (B,Q)

        modes = {"bbs": span_scores(end_points, prefix, width)}
        if with_contrast:
            modes["bbf"] = contrast_scores(end_points, prefix, width)
        for m, s in modes.items():
            scores = jnp.einsum("bqt,bkt->bkq", s, pmap)[:, 0]  # (B, Q)
            scores = scores * is_correct
            top = jnp.argmax(scores, axis=-1)  # (B,)
            pbox = jnp.take_along_axis(
                pred, top[:, None, None], axis=1
            )  # (B, 1, 6)
            snap_iou, _ = pairwise_iou3d(
                all_xyz, box_cxcyczwhd_to_xyzxyz(pbox)
            )  # (B, M, 1)
            snap_iou = jnp.where(all_mask[:, :, None], snap_iou, -1.0)
            best = jnp.argmax(snap_iou[:, :, 0], axis=-1)  # (B,)
            snapped = jnp.take_along_axis(
                all_boxes, best[:, None, None], axis=1
            )[:, 0]  # (B, 6)
            out[prefix + m] = (
                (snapped == gt[:, 0]).all(axis=-1).astype(jnp.float32)
            )
    out["mask"] = mask[:, 0]
    if with_contrast and "last_" in prefixes:
        out["root_found"] = out["last_bbf"]
    return out


class GroundingGTEvaluator(GroundingEvaluator):
    """Exact-match accuracy under GT-box snapping (cls / gt setups)."""

    def __init__(self, prefixes=(), with_contrast: bool = True, logger=None):
        self.prefixes = list(prefixes)
        self.with_contrast = with_contrast
        self.modes = ["bbs", "bbf"] if with_contrast else ["bbs"]
        self._log = logger.info if logger is not None else print
        self._kernel = jax.jit(
            lambda ep: gt_grounding_batch_hits(
                ep, tuple(self.prefixes), with_contrast=with_contrast
            )
        )
        self.reset()

    def reset(self):
        self.dets = {
            (p, m): 0.0 for p in self.prefixes for m in self.modes
        }
        self.gts = dict(self.dets)
        for f in BREAKDOWN_FIELDS:
            self.dets[f] = 0.0
            self.gts[f] = 1e-14

    def evaluate(self, end_points: Dict):
        out = self._kernel(end_points)
        out = jax.tree_util.tree_map(np.asarray, out)
        mask = out["mask"]  # (B,)
        for p in self.prefixes:
            for m in self.modes:
                self.dets[(p, m)] += float((out[p + m] * mask).sum())
                self.gts[(p, m)] += float(mask.sum())
        if "root_found" in out:
            self._breakdown(end_points, out["root_found"], mask)

    def accuracy(self, prefix: str, mode: str = "bbf", **_):
        return self.dets[(prefix, mode)] / max(self.gts[(prefix, mode)], 1)

    def print_stats(self):
        mode_str = {
            "bbs": "Box given span (soft-token)",
            "bbf": "Box given span (contrastive)",
        }
        for p in self.prefixes:
            for m in self.modes:
                self._log(f"{p} {mode_str[m]} Acc: {self.accuracy(p, m):.4f}")
        self._log("Analysis")
        for f in BREAKDOWN_FIELDS:
            self._log(f"{f} {self.dets[f] / self.gts[f]:.4f}")
