"""Native (C++) host-runtime tests: build, PLY parity, NMS parity,
VOC-matcher parity vs the pure-python paths."""

import numpy as np
import pytest

from butd_detr_tpu.native import (
    greedy_nms_native,
    load_native,
    ply_read_vertices_native,
    points_in_boxes_native,
    voc_match_native,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native lib unavailable (no compiler?)"
)


def test_native_builds():
    assert load_native() is not None


def test_ply_native_matches_python(tmp_path):
    from butd_detr_tpu.data.scan import _read_ply_py
    from butd_detr_tpu.data.synthetic import _write_ply

    rng = np.random.RandomState(0)
    pc = rng.randn(500, 3).astype(np.float32)
    color = rng.randint(0, 255, (500, 3)).astype(np.uint8)
    path = str(tmp_path / "test.ply")
    _write_ply(path, pc, color=color)

    got = ply_read_vertices_native(path)
    assert got is not None
    xyz, rgb, _ = got
    want = _read_ply_py(path)
    np.testing.assert_array_equal(xyz[:, 0], want["x"])
    np.testing.assert_array_equal(xyz[:, 2], want["z"])
    np.testing.assert_array_equal(rgb[:, 1], want["green"])


def test_ply_native_label_file(tmp_path):
    from butd_detr_tpu.data.synthetic import _write_ply

    rng = np.random.RandomState(1)
    pc = rng.randn(100, 3).astype(np.float32)
    label = rng.randint(0, 40, 100)
    path = str(tmp_path / "labels.ply")
    _write_ply(path, pc, label=label)
    xyz, rgb, got_label = ply_read_vertices_native(path)
    np.testing.assert_array_equal(got_label, label)


def _py_nms(mins, maxs, scores, thresh, classes=None):
    area = np.prod(maxs - mins, axis=-1)
    order = list(np.argsort(scores))
    pick = []
    while order:
        i = order.pop()
        pick.append(i)
        rest = []
        for j in order:
            lo = np.maximum(mins[i], mins[j])
            hi = np.minimum(maxs[i], maxs[j])
            inter = np.prod(np.clip(hi - lo, 0, None))
            o = inter / (area[i] + area[j] - inter)
            if classes is not None and classes[i] != classes[j]:
                o = 0.0
            if o <= thresh:
                rest.append(j)
        order = rest
    return pick


def test_nms_native_matches_python():
    rng = np.random.RandomState(2)
    for trial in range(5):
        mins = rng.rand(60, 3) * 4
        maxs = mins + rng.rand(60, 3) + 0.1
        scores = rng.rand(60)
        classes = rng.randint(0, 3, 60) if trial % 2 else None
        got = greedy_nms_native(mins, maxs, scores, 0.3, False, classes)
        want = _py_nms(mins.astype(np.float32), maxs.astype(np.float32),
                       scores.astype(np.float32), 0.3, classes)
        assert got == want


def test_voc_match_native():
    # det 0 matches gt in img 0; det 1 is a duplicate (fp); det 2 off
    det = np.array([
        [0, 0, 0, 1, 1, 1],
        [0.05, 0, 0, 1.05, 1, 1],
        [5, 5, 5, 6, 6, 6],
    ], np.float32)
    det_img = np.array([0, 0, 0], np.int32)
    gt = np.array([[0, 0, 0, 1, 1, 1]], np.float32)
    gt_img = np.array([0], np.int32)
    tp, fp = voc_match_native(det, det_img, gt, gt_img, 0.25)
    assert tp.tolist() == [1, 0, 0]
    assert fp.tolist() == [0, 1, 1]


def test_points_in_boxes_native():
    rng = np.random.RandomState(3)
    pts = rng.rand(1000, 3).astype(np.float32)
    boxes = np.array([
        [0, 0, 0, 1, 1, 1],      # everything
        [0, 0, 0, 0.5, 0.5, 0.5],
        [2, 2, 2, 3, 3, 3],      # nothing
    ], np.float32)
    counts = points_in_boxes_native(pts, boxes)
    assert counts[0] == 1000
    assert counts[2] == 0
    want = ((pts[:, None] >= boxes[None, :, :3])
            & (pts[:, None] <= boxes[None, :, 3:])).all(-1).sum(0)
    np.testing.assert_array_equal(counts, want)


def test_eval_det_cls_native_vs_python():
    """Full eval_det_cls agreement with and without the native matcher."""
    from butd_detr_tpu.eval import get_3d_box
    from butd_detr_tpu.eval.detection import eval_det_cls

    rng = np.random.RandomState(4)
    pred, gt = {}, {}
    for img in range(4):
        gt[img] = [
            get_3d_box(rng.rand(3) + 0.3, 0.0, rng.rand(3) * 3)
            for _ in range(3)
        ]
        pred[img] = []
        for g in gt[img]:
            center = g.mean(axis=0) + rng.randn(3) * 0.05
            pred[img].append(
                (get_3d_box(rng.rand(3) + 0.3, 0.0, center), rng.rand())
            )
    rec_n, prec_n, ap_n = eval_det_cls(pred, gt, 0.25)

    # force the python path via a wrapped iou fn
    from butd_detr_tpu.eval.box_util import get_iou_obb

    rec_p, prec_p, ap_p = eval_det_cls(
        pred, gt, 0.25, get_iou_func=lambda a, b: get_iou_obb(a, b)
    )
    assert ap_n == pytest.approx(ap_p)
    np.testing.assert_allclose(rec_n, rec_p)
