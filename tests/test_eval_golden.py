"""Golden parity: our vectorized GroundingEvaluator vs counts produced by
RUNNING the reference src/grounding_evaluator.py on the same random
end_points (fixture: tests/golden/eval_golden.npz)."""

import os.path as osp

import numpy as np
import pytest

FIXTURE = osp.join(osp.dirname(osp.abspath(__file__)), "golden",
                   "eval_golden.npz")


def test_grounding_evaluator_matches_reference():
    from butd_detr_tpu.eval import GroundingEvaluator

    g = dict(np.load(FIXTURE, allow_pickle=False))
    ep = {k: v for k, v in g.items()
          if not k.startswith(("det__", "gt__"))}

    ev = GroundingEvaluator(
        only_root=True, thresholds=(0.25, 0.5), topks=(1, 5, 10),
        prefixes=["proposal_", "last_"],
    )
    ev.evaluate(ep)

    for p in ("proposal_", "last_"):
        for t in (0.25, 0.5):
            for k in (1, 5, 10):
                for m in ("bbs", "bbf"):
                    want = float(g[f"det__{p}__{t}__{k}__{m}"])
                    got = float(ev.dets[(p, t, k, m)])
                    assert got == pytest.approx(want), (p, t, k, m, got, want)
    for f in ("vd", "vid", "hard", "easy", "unique", "multi"):
        assert float(ev.dets[f]) == pytest.approx(float(g[f"det__{f}"])), f
        assert float(ev.gts[f]) == pytest.approx(float(g[f"gt__{f}"])), f
