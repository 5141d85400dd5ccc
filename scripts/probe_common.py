"""Shared probe metrics for the attribution experiments (VERDICT r4 #1).

Both arms — the reference-torch control (scripts/ref_control_arm.py) and
the JAX framework (scripts/overfit_probe.py) — reduce their raw model
outputs to THE SAME numbers through THIS code, so the curves are
comparable by construction:

  - matched_ce: soft-token CE of the Hungarian-matched query for the root
    target, i.e. -log(sum of probs over the GT span bins) — the quantity
    that has been pinned at 4+ across four rounds of studies while the
    eos CE sits near 0 (NOTES.md r4 diagnosis; reference loss at
    /root/reference/models/losses.py:355-390).
  - eos_ce: mean -log p(bin 255) over ALL queries (the no-object anchor).
  - p_span: matched query's probability mass on the GT span bins.
  - argmax255: fraction of matched queries whose argmax is the no-object
    bin — the discriminating statistic: "does the matched argmax escape
    bin 255?"
  - acc: GT-evaluator-style exact-match hit rate (top bbs-scored query
    gated by IoU>0.25 with any scene box, snapped to the nearest scene
    box; reference src/grounding_evaluator.py:330-484 semantics).

The matcher here mirrors the reference HungarianMatcher weights
(main_utils.py:243: cost_class 1, cost_bbox 0, cost_giou 2) via scipy on
host — independent of either framework's own matcher implementation.
"""
import json
import os.path as osp

import numpy as np


def build_dataset(root, tok, split, butd_cls=True, joint_det=True,
                  num_points=50000, eval_train=False):
    """The study dataset, identical for both arms (sr3d synthetic scans +
    scannet-det x10 when joint_det; GT-proposal stream when butd_cls)."""
    from butd_detr_tpu.data import JointGroundingDataset
    from butd_detr_tpu.data.scan import load_scans_parallel

    with open(osp.join(root, "meta_data", "scannetv2_train.txt")) as f:
        train_ids = [l.strip() for l in f if l.strip()]
    scans = load_scans_parallel(
        train_ids, osp.join(root, "scans"), osp.join(root, "meta_data"),
        num_workers=1, keep_points=num_points,
    )
    ddict = {"sr3d": 1}
    if joint_det and split == "train":
        ddict["scannet"] = 10
    data_path = root
    if eval_train:
        from scripts.train_split_eval import make_trainval_root

        data_path = make_trainval_root(root)
    return JointGroundingDataset(
        split=split, dataset_dict=ddict, test_dataset="sr3d",
        data_path=data_path, scans=scans, tokenizer=tok,
        use_color=True, butd=not butd_cls, butd_cls=butd_cls,
        butd_gt=False, detect_intermediate=joint_det and split == "train",
        max_text_len=32, max_num_obj=16, max_det_boxes=16,
    )


def load_text_init(path, params):
    """Replace params['text_encoder'] with a trunk saved by
    scripts/pretrain_text.py (shape-checked). Returns a new params dict."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    data = np.load(path)
    tree = unflatten_dict(
        {tuple(k.split("/")): data[k] for k in data.files}
    )
    cur = flatten_dict(params["text_encoder"])
    new = flatten_dict(tree)
    missing = set(cur) ^ set(new)
    assert not missing, f"text_init param mismatch: {sorted(missing)[:5]}"
    for k in cur:
        assert cur[k].shape == new[k].shape, (k, cur[k].shape, new[k].shape)
    params = dict(params)
    params["text_encoder"] = jax.tree_util.tree_map(jnp.asarray, tree)
    return params


def probe_row(pred_by_prefix, batch_np, step):
    """pred_by_prefix: {prefix: (logits (B,Q,C) f32 np, boxes (B,Q,6) np)}.

    batch_np: a collate() batch (numpy). Returns the probe row dict.
    """
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from butd_detr_tpu.losses.boxes import (
        box_cxcyczwhd_to_xyzxyz,
        generalized_box_iou3d,
        pairwise_iou3d,
    )

    pmap = np.asarray(batch_np["positive_map"], np.float32)
    gt = np.concatenate(
        [batch_np["center_label"][..., :3], batch_np["size_gts"]], -1
    )
    all_boxes = np.asarray(batch_np["all_bboxes"], np.float32)
    all_mask = np.asarray(batch_np["all_bbox_label_mask"], bool)
    B = pmap.shape[0]

    row = {"step": step}
    for prefix, (logits, pred) in pred_by_prefix.items():
        logits = np.asarray(logits, np.float32)
        pred = np.asarray(pred, np.float32)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        logp = np.log(np.maximum(probs, 1e-12))

        ce_m, p_span, arg255, hits = [], [], 0, 0
        for b in range(B):
            valid = np.asarray(batch_np["box_label_mask"][b], bool)
            tgt = gt[b][valid]
            tpm = pmap[b][valid]
            cost_class = -(probs[b] @ tpm.T)
            giou = np.asarray(generalized_box_iou3d(
                jnp.asarray(box_cxcyczwhd_to_xyzxyz(jnp.asarray(pred[b]))),
                jnp.asarray(box_cxcyczwhd_to_xyzxyz(jnp.asarray(tgt))),
            ))
            # HungarianMatcher(1, 0, 2): L1 weight is ZERO in the recipe
            C = 1 * cost_class + 2 * -giou
            qi, ti = linear_sum_assignment(C)
            q = int(qi[list(ti).index(0)])
            span = np.nonzero(pmap[b, 0])[0]
            ce_m.append(-np.log(max(float(probs[b, q, span].sum()), 1e-9)))
            p_span.append(float(probs[b, q, span].sum()))
            arg255 += int(probs[b, q].argmax() == probs.shape[-1] - 1)

            # cls exact-match: top query by evaluator-gated bbs score
            iou_all = np.asarray(pairwise_iou3d(
                jnp.asarray(box_cxcyczwhd_to_xyzxyz(
                    jnp.asarray(all_boxes[b]))),
                jnp.asarray(box_cxcyczwhd_to_xyzxyz(jnp.asarray(pred[b]))),
            )[0])
            iou_all = np.where(all_mask[b][:, None], iou_all, 0.0)
            correct = iou_all.max(0) > 0.25
            sc = (probs[b] @ pmap[b, 0]) * correct
            top = int(sc.argmax())
            snap = int(np.where(all_mask[b], iou_all[:, top], -1).argmax())
            hits += int((all_boxes[b, snap] == gt[b, 0]).all())

        row[f"{prefix}matched_ce"] = round(float(np.mean(ce_m)), 3)
        row[f"{prefix}eos_ce"] = round(float(-logp[..., -1].mean()), 4)
        row[f"{prefix}p_span"] = round(float(np.mean(p_span)), 4)
        row[f"{prefix}argmax255"] = arg255 / B
        row[f"{prefix}acc"] = round(hits / B, 3)
    return row


def append_row(row, out_path):
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("PROBE", json.dumps(row), flush=True)
