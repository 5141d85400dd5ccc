"""Inference API: checkpoint -> grounded 3D boxes for (scene, utterance).

The reference has no standalone inference entry — prediction only happens
inside its evaluation loops (train_dist_mod.py:112-159 driving
src/grounding_evaluator.py). This module packages the same decision rule
as a reusable `GroundingPredictor`:

  * forward the scene + tokenized utterance through BeaUTyDETR,
  * score the 256 queries against the target phrase's token span — either
    ``bbs`` (softmaxed soft-token scores, grounding_evaluator.py:110-166)
    or ``bbf`` (contrastive query-token similarity, :168-242),
  * return the top-k boxes (cxcyczwhd) with their scores.

Works from an orbax checkpoint (this framework's native format) or a
reference ``.pth`` state dict via train/torch_convert.
"""

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from butd_detr_tpu.data.augment import MEAN_RGB
from butd_detr_tpu.data.positive_map import token_positive_map
from butd_detr_tpu.eval.grounding import (
    _pred_boxes,
    contrast_scores,
    span_scores,
)
from butd_detr_tpu.train.config import Config
from butd_detr_tpu.train.step import INPUT_KEYS, build_model

NUM_BINS = 256


def prepare_point_cloud(
    pc: np.ndarray,
    num_points: int,
    use_color: bool,
    use_height: bool = False,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """(N, 3) or (N, 6 xyz+rgb[0-1]) cloud -> (num_points, C) model input.

    Mirrors the dataset's feature assembly (data/joint_dataset.py:_get_pc):
    mean-RGB subtraction, optional height channel, fixed-size subsample
    (with replacement when the scene is smaller than num_points)."""
    rng = rng or np.random.RandomState(1184)
    pc = np.asarray(pc, np.float32)
    n = pc.shape[0]
    choice = (
        rng.choice(n, num_points, replace=n < num_points)
        if n != num_points
        else np.arange(n)
    )
    pc = pc[choice]
    feats = [pc[:, :3]]
    if use_color:
        if pc.shape[1] < 6:
            raise ValueError("use_color requires an (N, 6) xyz+rgb cloud")
        feats.append(pc[:, 3:6] - MEAN_RGB)
    if use_height:
        floor = np.percentile(pc[:, 2], 0.99)
        feats.append((pc[:, 2] - floor)[:, None])
    return np.concatenate(feats, axis=1).astype(np.float32)


class GroundingPredictor:
    """Single-scene grounding inference on top of the jitted eval forward.

    Parameters
    ----------
    cfg: train Config (num_points / max_text_len / butd flags matter).
    variables: {"params", "batch_stats"} tree — e.g. ``state.params`` /
        ``state.batch_stats`` from a restored TrainState.
    tokenizer: host tokenizer with the ``__call__``/``char_to_token``
        surface of data/positive_map.py (RobertaTokenizerFast or
        lang.tokenizer.SimpleTokenizer).
    """

    def __init__(self, cfg: Config, variables: Dict, tokenizer,
                 roberta_config=None, backbone_npoints=(2048, 1024, 512, 256)):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.model = build_model(
            cfg, roberta_config=roberta_config,
            backbone_npoints=backbone_npoints,
        )
        self.variables = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        self._fwd = jax.jit(
            lambda v, i: self.model.apply(v, i, train=False)
        )

    @classmethod
    def from_checkpoint(cls, cfg: Config, path: str, tokenizer, **kw):
        """Load either an orbax checkpoint dir or a torch ``.pth`` file."""
        import os.path as osp

        from butd_detr_tpu.data.synthetic import synthetic_batch

        pred = cls(cfg, {"params": {}, "batch_stats": {}}, tokenizer, **kw)
        batch = synthetic_batch(
            batch_size=1, num_points=cfg.num_points,
            num_feats=cfg.input_feature_dim,
            max_text_len=cfg.max_text_len,
            max_num_obj=cfg.max_num_obj,
            max_det_boxes=cfg.max_det_boxes,
        )
        if osp.isdir(path):  # orbax
            from butd_detr_tpu.train.checkpoint import load_checkpoint
            from butd_detr_tpu.train.optimizer import make_optimizer
            from butd_detr_tpu.train.step import init_state

            opt = make_optimizer(cfg, steps_per_epoch=1)
            template = init_state(
                pred.model, opt, batch, jax.random.PRNGKey(0)
            )
            state, _ = load_checkpoint(path, template)
            params, stats = state.params, state.batch_stats
        else:  # torch .pth via the converter (keys may carry DDP prefix)
            import torch

            from butd_detr_tpu.train.torch_convert import (
                convert_torch_checkpoint,
            )

            sd = torch.load(path, map_location="cpu")
            sd = sd.get("model", sd)
            inputs = {
                k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch
            }
            shapes = jax.eval_shape(
                lambda: pred.model.init(jax.random.PRNGKey(0), inputs)
            )
            zeros = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes
            )
            params, stats = convert_torch_checkpoint(
                sd, zeros["params"], zeros.get("batch_stats", {})
            )
        pred.variables = {"params": params, "batch_stats": stats}
        return pred

    # ------------------------------------------------------------------

    def _span_map(self, utterance: str, phrase: str) -> np.ndarray:
        """(1, 256) binarized token map of `phrase` inside `utterance`."""
        if phrase.lower() not in utterance.lower():
            raise ValueError(
                f"phrase {phrase!r} not found in utterance {utterance!r}"
            )
        _, pmap = token_positive_map(
            self.tokenizer, utterance, [phrase], max_num_obj=1,
        )
        L = self.cfg.max_text_len
        if pmap[0, :L].sum() == 0:
            # either never tokenized, or every span token sits past the
            # model's max_text_len window (where scores are zero-padded)
            raise ValueError(
                f"phrase {phrase!r}: its tokens fall past max_text_len "
                f"({L}) in {utterance!r}"
            )
        return (pmap > 0).astype(np.float32)

    def predict(
        self,
        point_cloud: np.ndarray,
        utterance: str,
        phrase: Optional[str] = None,
        det_boxes: Optional[np.ndarray] = None,
        det_class_ids: Optional[Sequence[int]] = None,
        mode: str = "bbf",
        top_k: int = 10,
    ) -> Dict[str, np.ndarray]:
        """Ground `phrase` (default: the whole utterance) in the scene.

        point_cloud: (N, 3) xyz or (N, 6) xyz+rgb in [0, 1].
        det_boxes: optional (D, 6) cxcyczwhd detected-box stream for the
        butd setups (GroupFree boxes, or GT boxes for butd_gt/butd_cls).
        Returns {"boxes": (top_k, 6) cxcyczwhd, "scores": (top_k,),
        "query_index": (top_k,)}.
        """
        cfg = self.cfg
        pc = prepare_point_cloud(
            point_cloud, cfg.num_points, cfg.use_color, cfg.use_height
        )
        tok = self.tokenizer([utterance], max_len=cfg.max_text_len)
        G = cfg.max_det_boxes
        boxes = np.zeros((G, 6), np.float32)
        mask = np.zeros((G,), bool)
        cids = np.zeros((G,), np.int32)
        if det_boxes is not None:
            d = min(len(det_boxes), G)
            boxes[:d] = np.asarray(det_boxes, np.float32)[:d]
            mask[:d] = True
            if det_class_ids is not None:
                cids[:d] = np.asarray(det_class_ids)[:d]
        inputs = {
            "point_clouds": pc[None],
            "text_ids": np.asarray(tok.ids, np.int32),
            "text_mask": np.asarray(tok.attention_mask, np.int32),
            "det_boxes": boxes[None],
            "det_bbox_label_mask": mask[None],
            "det_class_ids": cids[None],
        }
        inputs = {k: v for k, v in inputs.items() if k in INPUT_KEYS}
        if mode == "bbf" and not cfg.use_contrastive_align:
            raise ValueError(
                "mode='bbf' scores queries against contrastive projections;"
                " this checkpoint was built with use_contrastive_align="
                "False — use mode='bbs'"
            )
        if mode not in ("bbf", "bbs"):
            raise ValueError(f"unknown mode {mode!r} (use 'bbf' or 'bbs')")
        ep = self._fwd(self.variables, inputs)

        pmap = self._span_map(utterance, phrase or utterance.rstrip(". "))
        scorer = contrast_scores if mode == "bbf" else span_scores
        s = scorer(ep, "last_", NUM_BINS)  # (1, Q, 256)
        q_scores = np.asarray(
            jnp.einsum("bqt,kt->bkq", s, jnp.asarray(pmap))
        )[0, 0]  # (Q,)
        order = np.argsort(-q_scores)[:top_k]
        pred = np.asarray(_pred_boxes(ep, "last_"))[0]  # (Q, 6)
        return {
            "boxes": pred[order],
            "scores": q_scores[order],
            "query_index": order,
        }
