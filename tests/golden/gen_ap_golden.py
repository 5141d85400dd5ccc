#!/usr/bin/env python
"""Generate detection-AP golden fixtures by RUNNING the reference's
models/ap_helper.py + utils/eval_det.py on random predictions.

Usage: python tests/golden/gen_ap_golden.py  (requires /root/reference)
"""

import importlib.machinery
import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import torch

REF_ROOT = "/root/reference"
OUT = osp.join(osp.dirname(osp.abspath(__file__)), "ap_golden.npz")


def load_reference():
    for name in ("ipdb",):
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            mod.set_trace = lambda: None
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.path.insert(0, osp.join(REF_ROOT, "utils"))
    sys.path.insert(0, REF_ROOT)
    spec = importlib.util.spec_from_file_location(
        "ref_ap", osp.join(REF_ROOT, "models", "ap_helper.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dspec = importlib.util.spec_from_file_location(
        "ref_dc", osp.join(REF_ROOT, "data", "model_util_scannet.py")
    )
    dmod = importlib.util.module_from_spec(dspec)
    dspec.loader.exec_module(dmod)
    return mod, dmod


def main():
    ref, dc_mod = load_reference()
    rng = np.random.RandomState(11)
    B, Q, G, T = 3, 20, 6, 20  # 19 classes + no-object bin
    dc = dc_mod.ScannetDatasetConfig(18)

    keys = ("last_center", "last_pred_size", "last_sem_cls_scores",
            "center_label", "size_gts", "sem_cls_label", "box_label_mask")
    ep = {
        "last_center": torch.as_tensor(
            (rng.rand(B, Q, 3) * 4).astype(np.float32)),
        "last_pred_size": torch.as_tensor(
            (rng.rand(B, Q, 3) * 0.7 + 0.1).astype(np.float32)),
        "last_sem_cls_scores": torch.as_tensor(
            rng.randn(B, Q, T).astype(np.float32)),
        "center_label": torch.as_tensor(
            (rng.rand(B, G, 3) * 4).astype(np.float32)),
        "size_gts": torch.as_tensor(
            (rng.rand(B, G, 3) * 0.7 + 0.1).astype(np.float32)),
        "sem_cls_label": torch.as_tensor(rng.randint(0, 18, (B, G))),
        "box_label_mask": torch.as_tensor(
            np.stack([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0],
                      [1, 1, 0, 0, 0, 0]]).astype(np.float32)),
    }
    # plant near-exact detections (slightly perturbed: the reference's
    # convex-hull IoU degenerates on exactly-identical corner sets,
    # returning garbage like -3.5 — a reference bug we do not reproduce)
    for b in range(B):
        ep["last_center"][b, 0] = ep["center_label"][b, 0] + 0.013
        ep["last_pred_size"][b, 0] = ep["size_gts"][b, 0] * 1.02
        c = int(ep["sem_cls_label"][b, 0])
        ep["last_sem_cls_scores"][b, 0, :] = -4.0
        ep["last_sem_cls_scores"][b, 0, c] = 8.0

    config = {
        "remove_empty_box": False, "use_3d_nms": True, "nms_iou": 0.25,
        "use_old_type_nms": False, "cls_nms": True,
        "per_class_proposal": True, "conf_thresh": 0.0,
        "dataset_config": dc, "hungarian_loss": True,
    }
    preds = ref.parse_predictions(ep, config, "last_", size_cls_agnostic=True)
    gts = ref.parse_groundtruths(ep, config, size_cls_agnostic=True)
    calc = ref.APCalculator(0.25, dc.class2type)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()

    out = {k: ep[k].numpy() for k in keys}
    out["golden_mAP"] = np.float64(metrics["mAP"])
    out["golden_AR"] = np.float64(metrics["AR"])
    # per-sample detection counts after NMS+conf
    out["golden_num_dets"] = np.asarray([len(p) for p in preds])
    out["golden_num_gts"] = np.asarray([len(g) for g in gts])
    np.savez(OUT, **out)
    print("mAP", metrics["mAP"], "AR", metrics["AR"],
          [len(p) for p in preds])
    print("wrote", OUT)


if __name__ == "__main__":
    main()
