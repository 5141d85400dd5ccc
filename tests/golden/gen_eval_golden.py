#!/usr/bin/env python
"""Generate grounding-evaluator golden fixtures by RUNNING the reference's
src/grounding_evaluator.py (pure torch) on random end_points.

Usage: python tests/golden/gen_eval_golden.py  (requires /root/reference)
"""

import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import torch

REF_ROOT = "/root/reference"
OUT = osp.join(osp.dirname(osp.abspath(__file__)), "eval_golden.npz")


def load_reference_evaluator():
    # stub ipdb (debug-only import in the reference)
    import importlib.machinery

    for name in ("ipdb", "wandb"):
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            mod.set_trace = lambda: None
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    # grounding_evaluator does `from models.losses import ...`; importing
    # the real `models` package would pull in the CUDA extension. Register
    # a package stub whose `losses` submodule is loaded directly.
    lspec = importlib.util.spec_from_file_location(
        "models.losses", osp.join(REF_ROOT, "models", "losses.py")
    )
    losses_mod = importlib.util.module_from_spec(lspec)
    lspec.loader.exec_module(losses_mod)
    pkg = types.ModuleType("models")
    pkg.losses = losses_mod
    pkg.__path__ = []
    sys.modules["models"] = pkg
    sys.modules["models.losses"] = losses_mod

    sys.path.insert(0, REF_ROOT)
    spec = importlib.util.spec_from_file_location(
        "ref_eval", osp.join(REF_ROOT, "src", "grounding_evaluator.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ref = load_reference_evaluator()
    rng = np.random.RandomState(7)
    B, Q, G, T, M = 6, 24, 8, 256, 10
    n_valid = [1, 2, 3, 1, 4, 2]

    data = {}

    def put(name, arr):
        data[name] = arr

    put("center_label", (rng.rand(B, G, 3) * 4).astype(np.float32))
    put("size_gts", (rng.rand(B, G, 3) * 0.6 + 0.2).astype(np.float32))
    mask = np.zeros((B, G), np.float32)
    for b, n in enumerate(n_valid):
        mask[b, :n] = 1
    put("box_label_mask", mask)
    pm = np.zeros((B, G, T), np.float32)
    for b in range(B):
        for g in range(n_valid[b]):
            s = rng.randint(1, 20)
            pm[b, g, s:s + 2] = 0.5
    put("positive_map", pm)
    put("is_view_dep", (rng.rand(B) > 0.5))
    put("is_hard", (rng.rand(B) > 0.5))
    put("is_unique", (rng.rand(B) > 0.5))
    put("proj_tokens", (rng.randn(B, 48, 64) * 0.3).astype(np.float32))
    for p in ("proposal_", "last_"):
        put(p + "center", (rng.rand(B, Q, 3) * 4).astype(np.float32))
        put(p + "pred_size", (rng.rand(B, Q, 3) * 0.7 + 0.1).astype(np.float32))
        put(p + "sem_cls_scores", rng.randn(B, Q, T).astype(np.float32))
        put(p + "proj_queries", (rng.randn(B, Q, 64) * 0.3).astype(np.float32))
    # plant exact hits for some samples so accuracies are nontrivial
    for b in (0, 2, 4):
        data["last_center"][b, 3] = data["center_label"][b, 0]
        data["last_pred_size"][b, 3] = data["size_gts"][b, 0]
        # make its span score dominate
        data["last_sem_cls_scores"][b, 3] = -5.0
        s = np.argmax(pm[b, 0])
        data["last_sem_cls_scores"][b, 3, s:s + 2] = 10.0

    ep = {k: torch.as_tensor(v) for k, v in data.items()}
    ev = ref.GroundingEvaluator(
        only_root=True, thresholds=[0.25, 0.5], topks=[1, 5, 10],
        prefixes=["proposal_", "last_"],
    )
    for prefix in ["proposal_", "last_"]:
        ev.evaluate(ep, prefix)

    out = dict(data)
    for (p, t, k, m), v in {
        key: val for key, val in ev.dets.items() if isinstance(key, tuple)
    }.items():
        out[f"det__{p}__{t}__{k}__{m}"] = np.float64(v)
    for f in ("vd", "vid", "hard", "easy", "unique", "multi"):
        out[f"det__{f}"] = np.float64(ev.dets[f])
        out[f"gt__{f}"] = np.float64(ev.gts[f])
    np.savez(OUT, **out)
    hits = {k: float(v) for k, v in out.items() if k.startswith("det__last_")}
    print(hits)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
