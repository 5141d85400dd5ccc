"""Loss tests: matcher vs scipy oracle, box math vs numpy, criterion sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from butd_detr_tpu.losses import (
    CriterionConfig,
    batched_linear_sum_assignment,
    box_cxcyczwhd_to_xyzxyz,
    compute_hungarian_loss,
    compute_points_obj_cls_loss_hard_topk,
    generalized_box_iou3d,
    hungarian_match,
    loss_boxes,
    loss_labels_st,
    matched_giou3d,
    sigmoid_focal_loss,
)


# ------------------------------------------------------------------ matcher


@pytest.mark.parametrize("G,Q", [(5, 5), (7, 16), (132, 256), (1, 4)])
def test_lsa_matches_scipy_cost(G, Q):
    rng = np.random.RandomState(G * 100 + Q)
    cost = rng.randn(3, G, Q).astype(np.float32)
    got = np.asarray(batched_linear_sum_assignment(jnp.asarray(cost)))
    for b in range(3):
        rows, cols = linear_sum_assignment(cost[b])
        want_total = cost[b][rows, cols].sum()
        got_total = cost[b][np.arange(G), got[b]].sum()
        # optimal total cost must match scipy exactly
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5)
        # assignment must be a valid injection
        assert len(set(got[b].tolist())) == G


def test_hungarian_match_non_soft_token_vs_scipy():
    """The soft_token=False class cost (-prob[:, tgt_ids], reference
    losses.py:297-302): the full cost matrix and assignment must match a
    numpy+scipy reimplementation of the reference branch."""
    from butd_detr_tpu.losses.matcher import matcher_cost_matrix

    rng = np.random.RandomState(4)
    B, Q, G, C = 2, 10, 4, 16
    logits = rng.randn(B, Q, C).astype(np.float32)
    boxes = np.abs(rng.randn(B, Q, 6)).astype(np.float32) + 0.1
    gt = np.abs(rng.randn(B, G, 6)).astype(np.float32) + 0.1
    labels = rng.randint(0, C, (B, G)).astype(np.int64)
    mask = np.ones((B, G), np.float32)
    pmap = np.zeros((B, G, C), np.float32)  # unused on this branch

    C_got = np.asarray(matcher_cost_matrix(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(pmap),
        jnp.asarray(gt), jnp.asarray(mask), 1.0, 5.0, 2.0,
        jnp.asarray(labels),
    ))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    a_got = np.asarray(hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(pmap),
        jnp.asarray(gt), jnp.asarray(mask), 1.0, 5.0, 2.0,
        tgt_labels=jnp.asarray(labels),
    ))
    for b in range(B):
        rows, cols = linear_sum_assignment(C_got[b])
        want_total = C_got[b][rows, cols].sum()
        got_total = C_got[b][a_got[b], np.arange(G)].sum()
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5)
    # and the class term itself is exactly -prob[:, tgt_ids]
    C_cls_only = np.asarray(matcher_cost_matrix(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(pmap),
        jnp.asarray(gt), jnp.asarray(mask), 1.0, 0.0, 0.0,
        jnp.asarray(labels),
    ))
    for b in range(B):
        prob = softmax(logits[b])
        np.testing.assert_allclose(
            C_cls_only[b], -prob[:, labels[b]], rtol=1e-5, atol=1e-6
        )


def test_lsa_integer_costs_exact_assignment():
    rng = np.random.RandomState(0)
    cost = rng.randint(0, 50, (2, 6, 9)).astype(np.float32)
    got = np.asarray(batched_linear_sum_assignment(jnp.asarray(cost)))
    for b in range(2):
        rows, cols = linear_sum_assignment(cost[b])
        got_total = cost[b][np.arange(6), got[b]].sum()
        np.testing.assert_allclose(got_total, cost[b][rows, cols].sum())


def test_hungarian_match_with_padding():
    """Padded targets must not disturb the valid targets' matches."""
    rng = np.random.RandomState(1)
    B, Q, G, C = 2, 8, 5, 16
    logits = rng.randn(B, Q, C).astype(np.float32)
    boxes = np.abs(rng.randn(B, Q, 6)).astype(np.float32) + 0.1
    pmap = rng.rand(B, G, C).astype(np.float32)
    gt = np.abs(rng.randn(B, G, 6)).astype(np.float32) + 0.1
    mask = np.ones((B, G), np.float32)
    mask[:, 3:] = 0  # only 3 valid targets

    a_pad = np.asarray(hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(pmap),
        jnp.asarray(gt), jnp.asarray(mask),
    ))
    a_exact = np.asarray(hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(pmap[:, :3]),
        jnp.asarray(gt[:, :3]), jnp.asarray(mask[:, :3]),
    ))
    np.testing.assert_array_equal(a_pad[:, :3], a_exact)


# ----------------------------------------------------------------- box math


def test_box_conversion_and_giou():
    box = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0]])
    corners = np.asarray(box_cxcyczwhd_to_xyzxyz(box))
    np.testing.assert_allclose(corners, [[0, 0, 0, 2, 4, 6]])

    # identical boxes: IoU=GIoU=1
    g = np.asarray(generalized_box_iou3d(
        box_cxcyczwhd_to_xyzxyz(box), box_cxcyczwhd_to_xyzxyz(box)
    ))
    np.testing.assert_allclose(g, [[1.0]], atol=1e-6)

    # disjoint boxes: GIoU < 0
    box2 = jnp.asarray([[10.0, 10.0, 10.0, 1.0, 1.0, 1.0]])
    g2 = float(generalized_box_iou3d(
        box_cxcyczwhd_to_xyzxyz(box), box_cxcyczwhd_to_xyzxyz(box2)
    )[0, 0])
    assert g2 < 0

    # matched_giou3d agrees with the pairwise diagonal
    rng = np.random.RandomState(2)
    a = box_cxcyczwhd_to_xyzxyz(jnp.asarray(
        np.concatenate([rng.randn(4, 3), np.abs(rng.randn(4, 3)) + 0.1], 1)
        .astype(np.float32)
    ))
    b = box_cxcyczwhd_to_xyzxyz(jnp.asarray(
        np.concatenate([rng.randn(4, 3), np.abs(rng.randn(4, 3)) + 0.1], 1)
        .astype(np.float32)
    ))
    np.testing.assert_allclose(
        np.asarray(matched_giou3d(a, b)),
        np.diag(np.asarray(generalized_box_iou3d(a, b))),
        rtol=1e-5,
    )


# ----------------------------------------------------------------- losses


def test_loss_boxes_zero_for_perfect_prediction():
    B, Q, G = 1, 4, 2
    gt = jnp.asarray(
        [[[0, 0, 0, 1, 1, 1], [2, 2, 2, 1, 2, 1]]], jnp.float32
    )
    pred = jnp.zeros((B, Q, 6)).at[0, 1].set(gt[0, 0]).at[0, 3].set(gt[0, 1])
    assignment = jnp.asarray([[1, 3]], jnp.int32)
    mask = jnp.ones((B, G))
    out = loss_boxes(pred, gt, assignment, mask, num_boxes=2.0)
    assert float(out["loss_bbox"]) == 0.0
    np.testing.assert_allclose(float(out["loss_giou"]), 0.0, atol=1e-6)


def test_loss_labels_st_oracle():
    """Compare against a direct numpy transcription of the formula."""
    rng = np.random.RandomState(3)
    B, Q, G, C = 2, 6, 3, 8
    logits = rng.randn(B, Q, C).astype(np.float32)
    pmap = np.zeros((B, G, C), np.float32)
    for b in range(B):
        for g in range(G):
            on = rng.choice(C - 1, 2, replace=False)
            pmap[b, g, on] = 0.5
    assignment = np.stack([rng.permutation(Q)[:G] for _ in range(B)])
    mask = np.ones((B, G), np.float32)
    mask[1, 2] = 0
    num_boxes = mask.sum()

    got = float(loss_labels_st(
        jnp.asarray(logits), jnp.asarray(pmap),
        jnp.asarray(assignment.astype(np.int32)), jnp.asarray(mask),
        num_boxes, eos_coef=0.1,
    ))

    # numpy oracle
    logp = logits - np.log(
        np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)
    ) - logits.max(-1, keepdims=True)
    tgt = np.zeros((B, Q, C), np.float32)
    tgt[:, :, -1] = 1
    w = np.full((B, Q), 0.1, np.float32)
    for b in range(B):
        for g in range(G):
            if mask[b, g]:
                tgt[b, assignment[b, g]] = pmap[b, g]
                w[b, assignment[b, g]] = 1.0
    ent = np.log(tgt + 1e-6) * tgt
    ce = (ent - logp * tgt).sum(-1)
    want = (ce * w).sum() / num_boxes
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sigmoid_focal_loss_matches_formula():
    z = jnp.asarray([[0.5, -1.0]])
    t = jnp.asarray([[1.0, 0.0]])
    w = jnp.asarray([[1.0, 1.0]])
    got = np.asarray(sigmoid_focal_loss(z, t, w))
    p = 1 / (1 + np.exp(-np.asarray(z)))
    alpha_w = np.asarray(t) * 0.25 + (1 - np.asarray(t)) * 0.75
    pt = np.asarray(t) * (1 - p) + (1 - np.asarray(t)) * p
    bce = -(np.asarray(t) * np.log(p) + (1 - np.asarray(t)) * np.log(1 - p))
    want = alpha_w * pt**2 * bce
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _tiny_end_points(B=2, Q=8, G=4, C=16, L=6, K=10, N=64, seed=0):
    rng = np.random.RandomState(seed)
    ep = {}
    for prefix in ["proposal_", "0head_", "last_"]:
        ep[prefix + "center"] = jnp.asarray(rng.randn(B, Q, 3), jnp.float32)
        ep[prefix + "pred_size"] = jnp.asarray(
            np.abs(rng.randn(B, Q, 3)) + 0.1, jnp.float32
        )
        ep[prefix + "sem_cls_scores"] = jnp.asarray(
            rng.randn(B, Q, C), jnp.float32
        )
        pq = rng.randn(B, Q, 4).astype(np.float32)
        ep[prefix + "proj_queries"] = jnp.asarray(
            pq / np.linalg.norm(pq, axis=-1, keepdims=True)
        )
    pt = rng.randn(B, L, 4).astype(np.float32)
    ep["proj_tokens"] = jnp.asarray(
        pt / np.linalg.norm(pt, axis=-1, keepdims=True)
    )
    ep["center_label"] = jnp.asarray(rng.randn(B, G, 3), jnp.float32)
    ep["size_gts"] = jnp.asarray(np.abs(rng.randn(B, G, 3)) + 0.1, jnp.float32)
    pmap = np.zeros((B, G, C), np.float32)
    pmap[:, :, 1] = 1.0
    ep["positive_map"] = jnp.asarray(pmap)
    mask = np.ones((B, G), np.float32)
    mask[:, -1] = 0
    ep["box_label_mask"] = jnp.asarray(mask)
    tm = np.zeros((B, L), np.int32)
    tm[:, :4] = 1
    ep["text_mask"] = jnp.asarray(tm)
    ep["seed_inds"] = jnp.asarray(rng.randint(0, N, (B, K)).astype(np.int32))
    ep["seed_xyz"] = jnp.asarray(rng.randn(B, K, 3), jnp.float32)
    ep["seeds_obj_cls_logits"] = jnp.asarray(rng.randn(B, K), jnp.float32)
    pil = rng.randint(-1, G - 1, (B, N)).astype(np.int32)
    ep["point_instance_label"] = jnp.asarray(pil)
    return ep


def test_compute_hungarian_loss_finite_and_jittable():
    ep = _tiny_end_points()
    loss, ep_out = jax.jit(
        lambda e: compute_hungarian_loss(e, num_decoder_layers=2)
    )(ep)
    assert np.isfinite(float(loss))
    for k in ["loss_ce", "loss_bbox", "loss_giou", "loss_contrastive_align",
              "query_points_generation_loss"]:
        assert np.isfinite(float(ep_out[k])), k
    # deep supervision: per-prefix losses recorded
    assert "proposal__loss_ce" in ep_out
    assert "last__loss_giou" in ep_out


def test_compute_hungarian_loss_grads_flow():
    ep = _tiny_end_points()
    keys = ["last_center", "last_pred_size", "last_sem_cls_scores",
            "seeds_obj_cls_logits"]

    def f(vals):
        e = dict(ep)
        e.update(vals)
        loss, _ = compute_hungarian_loss(e, num_decoder_layers=2)
        return loss

    g = jax.grad(f)({k: ep[k] for k in keys})
    for k in keys:
        assert np.isfinite(np.asarray(g[k])).all(), k
        assert float(jnp.abs(g[k]).sum()) > 0, k


def test_kps_loss_prefers_close_seeds():
    """Seeds near GT centers must be labeled positive -> lower loss when
    their logits are high."""
    B, K, G, N = 1, 6, 2, 32
    ep = {
        "box_label_mask": jnp.asarray([[1.0, 1.0]]),
        "seed_inds": jnp.asarray([[0, 1, 2, 3, 4, 5]], jnp.int32),
        "seed_xyz": jnp.asarray(
            [[[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [5.1, 5, 5],
              [9, 9, 9], [9, 9, 8]]], jnp.float32
        ),
        "center_label": jnp.asarray([[[0, 0, 0], [5, 5, 5]]], jnp.float32),
        "size_gts": jnp.asarray([[[1, 1, 1], [1, 1, 1]]], jnp.float32),
        "point_instance_label": jnp.asarray(
            [[0, 0, 1, 1, -1, -1] + [-1] * (N - 6)], jnp.int32
        ),
    }
    good = dict(ep)
    good["seeds_obj_cls_logits"] = jnp.asarray(
        [[4.0, 4.0, 4.0, 4.0, -4.0, -4.0]]
    )
    bad = dict(ep)
    bad["seeds_obj_cls_logits"] = jnp.asarray(
        [[-4.0, -4.0, -4.0, -4.0, 4.0, 4.0]]
    )
    lg = float(compute_points_obj_cls_loss_hard_topk(good, topk=2))
    lb = float(compute_points_obj_cls_loss_hard_topk(bad, topk=2))
    assert lg < lb


def test_loss_boxes_finite_on_degenerate_padded_rows():
    """Regression: padded GT rows (center 1000, size 0) build zero-width
    corner boxes in f32 (the 1e-6 size clamp is absorbed by the center's
    magnitude); once a pred size goes negative too (the reference would
    hard-assert here, losses.py:32-34), union == 0 gave a 0/0 NaN that
    escaped the box mask via 0*NaN. Observed live at step 870 of the
    4-scene overfit study."""
    from butd_detr_tpu.losses.criterion import loss_boxes

    # one valid gt + one padded gt; pred 0 has a NEGATIVE size component
    # and a center far from the origin (triggers f32 absorption)
    pred = jnp.asarray(
        [[[-16.3, 4.86, 8.91, -2.51, 0.455, 0.932],
          [0.0, 0.0, 0.0, 0.5, 0.5, 0.5]]]
    )
    gt = jnp.asarray(
        [[[0.1, 0.0, 0.0, 0.5, 0.5, 0.5],
          [1000.0, 1000.0, 1000.0, 0.0, 0.0, 0.0]]]
    )
    assignment = jnp.asarray([[1, 0]], jnp.int32)  # padded row -> pred 0
    mask = jnp.asarray([[1.0, 0.0]])
    out = loss_boxes(pred, gt, assignment, mask, num_boxes=1.0)
    assert np.isfinite(float(out["loss_giou"])), out
    assert np.isfinite(float(out["loss_bbox"])), out

    # gradient w.r.t. pred must be finite too
    g = jax.grad(
        lambda p: loss_boxes(p, gt, assignment, mask, 1.0)["loss_giou"]
    )(pred)
    assert bool(jnp.isfinite(g).all())
