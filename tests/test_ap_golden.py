"""Golden parity: our detection AP stack (parse_predictions, NMS,
APCalculator, VOC AP) vs values from RUNNING the reference
models/ap_helper.py + utils/eval_det.py on the same inputs
(fixture: tests/golden/ap_golden.npz)."""

import os.path as osp

import numpy as np
import pytest

FIXTURE = osp.join(osp.dirname(osp.abspath(__file__)), "golden",
                   "ap_golden.npz")


def test_detection_ap_matches_reference():
    from butd_detr_tpu.eval import (
        APCalculator,
        default_parse_config,
        parse_groundtruths,
        parse_predictions,
    )

    g = dict(np.load(FIXTURE, allow_pickle=False))
    ep = {k: v for k, v in g.items() if not k.startswith("golden_")}

    cfg = default_parse_config(dataset_num_class=18)
    preds = parse_predictions(ep, cfg, "last_")
    gts = parse_groundtruths(ep)

    np.testing.assert_array_equal(
        [len(p) for p in preds], g["golden_num_dets"]
    )
    np.testing.assert_array_equal(
        [len(t) for t in gts], g["golden_num_gts"]
    )

    calc = APCalculator(ap_iou_thresh=0.25)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    assert m["mAP"] == pytest.approx(float(g["golden_mAP"]), rel=1e-6)
    assert m["AR"] == pytest.approx(float(g["golden_AR"]), rel=1e-6)
