"""Eval-stack tests: NMS vs brute-force oracle, VOC AP, box IoU, grounding
evaluator vs a direct per-sample numpy re-implementation of the reference
loops (src/grounding_evaluator.py:110-242)."""

import numpy as np
import pytest

from butd_detr_tpu.eval import (
    APCalculator,
    GroundingEvaluator,
    GroundingGTEvaluator,
    aabb_iou,
    box3d_iou,
    corners_to_aabb,
    default_parse_config,
    eval_grounding,
    get_3d_box,
    get_3d_box_batch,
    get_iou_obb,
    nms_3d_faster,
    nms_3d_faster_samecls,
    parse_groundtruths,
    parse_predictions,
    voc_ap,
)


def _rand_boxes(rng, k):
    mins = rng.rand(k, 3) * 4
    sizes = rng.rand(k, 3) * 2 + 0.1
    return np.concatenate([mins, mins + sizes], axis=-1)


def _oracle_nms(boxes6, scores, thresh, classes=None):
    order = list(np.argsort(scores))[::-1]
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        rest = []
        for j in order:
            lo = np.maximum(boxes6[i, :3], boxes6[j, :3])
            hi = np.minimum(boxes6[i, 3:], boxes6[j, 3:])
            inter = np.prod(np.clip(hi - lo, 0, None))
            va = np.prod(boxes6[i, 3:] - boxes6[i, :3])
            vb = np.prod(boxes6[j, 3:] - boxes6[j, :3])
            o = inter / (va + vb - inter)
            if classes is not None and classes[i] != classes[j]:
                o = 0.0
            if o <= thresh:
                rest.append(j)
        order = rest
    return keep


def test_nms3d_matches_oracle():
    rng = np.random.RandomState(0)
    for _ in range(5):
        b = _rand_boxes(rng, 40)
        s = rng.rand(40)
        got = nms_3d_faster(np.concatenate([b, s[:, None]], -1), 0.3)
        want = _oracle_nms(b, s, 0.3)
        assert sorted(got) == sorted(want)


def test_nms3d_samecls_matches_oracle():
    rng = np.random.RandomState(1)
    b = _rand_boxes(rng, 50)
    s = rng.rand(50)
    c = rng.randint(0, 3, 50)
    arr = np.concatenate([b, s[:, None], c[:, None].astype(float)], -1)
    got = nms_3d_faster_samecls(arr, 0.25)
    want = _oracle_nms(b, s, 0.25, classes=c)
    assert sorted(got) == sorted(want)


def test_voc_ap_perfect_detector():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == pytest.approx(1.0)
    # all false positives
    assert voc_ap(np.array([0.0, 0.0]), np.array([0.0, 0.0])) == 0.0


def test_box3d_iou_axis_aligned_agrees_with_aabb():
    rng = np.random.RandomState(2)
    for _ in range(10):
        c1, c2 = rng.rand(2, 3) * 2
        s1, s2 = rng.rand(2, 3) + 0.2
        b1 = get_3d_box(s1, 0.0, c1)
        b2 = get_3d_box(s2, 0.0, c2)
        iou_hull, _ = box3d_iou(b1, b2)
        iou_aabb = aabb_iou(corners_to_aabb(b1), corners_to_aabb(b2))
        assert iou_hull == pytest.approx(float(iou_aabb), abs=1e-6)
        assert get_iou_obb(b1, b2) == pytest.approx(float(iou_aabb), abs=1e-6)


def test_get_3d_box_rotation_preserves_volume():
    b = get_3d_box((2.0, 1.0, 0.5), 0.7, (1.0, 2.0, 3.0))
    from butd_detr_tpu.eval import box3d_vol

    assert box3d_vol(b) == pytest.approx(1.0, rel=1e-6)
    assert b.mean(axis=0) == pytest.approx([1.0, 2.0, 3.0], abs=1e-6)


def _fake_det_end_points(rng, B=2, Q=8, G=4, T=12):
    return {
        "last_center": rng.randn(B, Q, 3).astype(np.float32),
        "last_pred_size": (rng.rand(B, Q, 3) + 0.2).astype(np.float32),
        "last_sem_cls_scores": rng.randn(B, Q, T).astype(np.float32),
        "center_label": rng.randn(B, G, 3).astype(np.float32),
        "size_gts": (rng.rand(B, G, 3) + 0.2).astype(np.float32),
        "sem_cls_label": rng.randint(0, 5, (B, G)),
        "box_label_mask": np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32),
    }


def test_parse_predictions_and_ap_pipeline():
    rng = np.random.RandomState(3)
    ep = _fake_det_end_points(rng)
    cfg = default_parse_config(dataset_num_class=5)
    preds = parse_predictions(ep, cfg)
    gts = parse_groundtruths(ep)
    assert len(preds) == 2 and len(gts) == 2
    assert len(gts[0]) == 3 and len(gts[1]) == 2
    calc = APCalculator(ap_iou_thresh=0.25)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()
    assert "mAP" in metrics and 0.0 <= metrics["mAP"] <= 1.0


def test_ap_is_one_when_predictions_equal_gt():
    rng = np.random.RandomState(4)
    B, G = 2, 3
    center = rng.randn(B, G, 3).astype(np.float32) * 2
    size = (rng.rand(B, G, 3) + 0.3).astype(np.float32)
    cls = np.array([[0, 1, 2], [0, 1, 2]])
    mask = np.ones((B, G), np.float32)
    ep = {
        "center_label": center, "size_gts": size,
        "sem_cls_label": cls, "box_label_mask": mask,
    }
    gts = parse_groundtruths(ep)
    # predictions: exact copies with score 0.9
    preds = [[(c, box, 0.9) for c, box in g] for g in gts]
    calc = APCalculator(ap_iou_thresh=0.25)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    assert m["mAP"] == pytest.approx(1.0)
    assert m["AR"] == pytest.approx(1.0)
    acc = calc.compute_accuracy()
    assert acc[1] == pytest.approx(1.0)


# ---------------- grounding evaluator ----------------


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _iou6(a, b):
    lo = np.maximum(a[..., :3], b[..., :3])
    hi = np.minimum(a[..., 3:], b[..., 3:])
    d = np.clip(hi - lo, 0, None)
    inter = d[..., 0] * d[..., 1] * d[..., 2]
    va = np.prod(np.maximum(a[..., 3:] - a[..., :3], 0), -1)
    vb = np.prod(np.maximum(b[..., 3:] - b[..., :3], 0), -1)
    return inter / (va + vb - inter)


def _to_corners(cxcyczwhd):
    c, s = cxcyczwhd[..., :3], np.maximum(cxcyczwhd[..., 3:], 1e-6)
    return np.concatenate([c - s / 2, c + s / 2], -1)


def _reference_span_eval(ep, prefix, thresholds, topks):
    """Direct numpy transcription of the reference per-sample loop."""
    dets = {}
    pm = (ep["positive_map"] > 0).astype(np.float32)[:, :1]
    gt = np.concatenate(
        [ep["center_label"][:, :, :3], ep["size_gts"]], -1
    )[:, :1]
    sem = _np_softmax(ep[f"{prefix}sem_cls_scores"])
    if sem.shape[-1] < pm.shape[-1]:
        pad = np.zeros(sem.shape[:-1] + (pm.shape[-1] - sem.shape[-1],))
        sem = np.concatenate([sem, pad], -1)
    pred = np.concatenate(
        [ep[f"{prefix}center"], ep[f"{prefix}pred_size"]], -1
    )
    B = pm.shape[0]
    for t in thresholds:
        for k in topks:
            dets[(t, k)] = 0
    for b in range(B):
        scores = (sem[b][None] * pm[b][:, None]).sum(-1)  # (1, Q)
        top = np.argsort(-scores, axis=1)[:, :10]
        pbox = pred[b][top.reshape(-1)]
        ious = _iou6(
            _to_corners(gt[b])[:, None], _to_corners(pbox)[None]
        )  # (1, 10)
        ious = ious[np.arange(1)[:, None], np.arange(10)[None] ]
        # actually (1, 10) already aligned since single object
        for t in thresholds:
            for k in topks:
                if (ious[0, :k] > t).any():
                    dets[(t, k)] += 1
    return dets


def _fake_grounding_end_points(rng, B=4, Q=16, G=6, T=32):
    ep = {
        "last_center": (rng.rand(B, Q, 3) * 4).astype(np.float32),
        "last_pred_size": (rng.rand(B, Q, 3) + 0.2).astype(np.float32),
        "last_sem_cls_scores": rng.randn(B, Q, T).astype(np.float32),
        "last_proj_queries": rng.randn(B, Q, 8).astype(np.float32),
        "proj_tokens": rng.randn(B, 10, 8).astype(np.float32),
        "center_label": (rng.rand(B, G, 3) * 4).astype(np.float32),
        "size_gts": (rng.rand(B, G, 3) + 0.2).astype(np.float32),
        "box_label_mask": np.ones((B, G), np.float32),
        "positive_map": (rng.rand(B, G, 256) > 0.9).astype(np.float32),
        "is_view_dep": rng.rand(B) > 0.5,
        "is_hard": rng.rand(B) > 0.5,
        "is_unique": rng.rand(B) > 0.5,
    }
    # make some predictions exact hits so accuracies are nontrivial
    ep["last_center"][:, 0] = ep["center_label"][:, 0]
    ep["last_pred_size"][:, 0] = ep["size_gts"][:, 0]
    return ep


def test_grounding_evaluator_matches_reference_loop():
    rng = np.random.RandomState(5)
    ep = _fake_grounding_end_points(rng)
    thresholds, topks = (0.25, 0.5), (1, 5, 10)
    ev = GroundingEvaluator(
        only_root=True, thresholds=thresholds, topks=topks,
        prefixes=["last_"],
    )
    ev.evaluate(ep)
    want = _reference_span_eval(ep, "last_", thresholds, topks)
    for t in thresholds:
        for k in topks:
            assert ev.dets[("last_", t, k, "bbs")] == want[(t, k)], (t, k)
            assert ev.gts[("last_", t, k, "bbs")] == ep["positive_map"].shape[0]
    # breakdown counts total to batch size
    assert ev.gts["easy"] + ev.gts["hard"] == pytest.approx(4, abs=1e-6)
    assert ev.gts["vd"] + ev.gts["vid"] == pytest.approx(4, abs=1e-6)
    ev.synchronize_between_processes()  # single-process no-op
    ev.print_stats()


def test_gt_grounding_evaluator_exact_setup():
    rng = np.random.RandomState(6)
    B, Q, G, M, T = 3, 8, 4, 5, 16
    all_boxes = np.concatenate(
        [(rng.rand(B, M, 3) * 4), (rng.rand(B, M, 3) + 0.3)], -1
    ).astype(np.float32)
    ep = {
        # predictions sit exactly on GT box 0 of each scene
        "last_center": np.tile(all_boxes[:, :1, :3], (1, Q, 1)),
        "last_pred_size": np.tile(all_boxes[:, :1, 3:], (1, Q, 1)),
        "last_sem_cls_scores": rng.randn(B, Q, T).astype(np.float32),
        "last_proj_queries": rng.randn(B, Q, 8).astype(np.float32),
        "proj_tokens": rng.randn(B, 10, 8).astype(np.float32),
        "center_label": all_boxes[:, :G, :3],
        "size_gts": all_boxes[:, :G, 3:],
        "box_label_mask": np.ones((B, G), np.float32),
        "positive_map": (rng.rand(B, G, 256) > 0.9).astype(np.float32),
        "all_bboxes": all_boxes,
        "all_bbox_label_mask": np.ones((B, M), bool),
        "is_view_dep": rng.rand(B) > 0.5,
        "is_hard": rng.rand(B) > 0.5,
        "is_unique": rng.rand(B) > 0.5,
    }
    ev = GroundingGTEvaluator(prefixes=["last_"])
    ev.evaluate(ep)
    # every query = GT box 0 = the root target -> accuracy 1.0
    assert ev.accuracy("last_", "bbs") == pytest.approx(1.0)
    assert ev.accuracy("last_", "bbf") == pytest.approx(1.0)
    ev.print_stats()


def test_metric_util_precision_recall():
    """Vectorized precision/recall vs hand calc (metric_util semantics)."""
    from butd_detr_tpu.eval import (
        calc_iou, multi_scene_precision_recall,
    )

    a = np.array([0, 0, 0, 2, 2, 2], float)
    assert calc_iou(a, a) == pytest.approx(1.0)
    b = np.array([10, 0, 0, 2, 2, 2], float)
    assert calc_iou(a, b) == 0.0

    labels = np.zeros((1, 2, 6))
    labels[0, 0] = [0, 0, 0, 2, 2, 2]
    labels[0, 1] = [5, 5, 5, 1, 1, 1]
    pred = np.zeros((1, 3, 7))
    pred[0, 0] = [0, 0, 0, 2, 2, 2, 0.9]   # TP
    pred[0, 1] = [20, 0, 0, 1, 1, 1, 0.9]  # FP
    pred[0, 2] = [5, 5, 5, 1, 1, 1, 0.1]   # below conf
    tp, fp, fn, (prec, rec) = multi_scene_precision_recall(
        labels, pred, iou_thresh=0.5, conf_thresh=0.5,
        label_mask=np.ones((1, 2)), pred_mask=np.ones((1, 3)),
    )
    assert (tp, fp, fn) == (1, 1, 1)
    assert prec == pytest.approx(0.5)
    assert rec == pytest.approx(0.5)
