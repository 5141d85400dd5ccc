"""Regression: compute_hungarian_loss is minimizable — optimizing free
prediction tensors collapses the box losses. Guards the matcher->loss
pairing consistency end-to-end (a mismatch would leave box L1 at a
plateau; see NOTES.md)."""

import numpy as np
import optax
import pytest


def test_hungarian_loss_collapses_under_direct_optimization():
    import jax
    import jax.numpy as jnp

    from butd_detr_tpu.data.synthetic import synthetic_batch
    from butd_detr_tpu.losses import CriterionConfig, compute_hungarian_loss

    B, Q, G, T, L = 2, 12, 6, 64, 12
    rng = np.random.RandomState(0)
    batch = synthetic_batch(
        batch_size=B, num_points=64, max_text_len=L, max_num_obj=G,
        max_det_boxes=G, n_true_objects=3, n_true_tokens=6, n_true_det=4,
        num_class_bins=T,
    )
    # positive_map must span the same bins as the logits
    pm = np.zeros((B, G, T), np.float32)
    pm[:, :3, 2:4] = 0.5
    batch["positive_map"] = pm

    ccfg = CriterionConfig(
        eos_coef=0.1, temperature=0.07, cost_class=1.0, cost_bbox=0.0,
        cost_giou=2.0, use_contrastive_align=True,
    )
    P = 2  # proposal + 1 decoder layer
    params = {
        "center": jnp.asarray(rng.randn(P, B, Q, 3) * 0.5 + 2, jnp.float32),
        "size_raw": jnp.asarray(rng.randn(P, B, Q, 3) * 0.1, jnp.float32),
        "logits": jnp.asarray(rng.randn(P, B, Q, T) * 0.01, jnp.float32),
        "pq": jnp.asarray(rng.randn(P, B, Q, 8) * 0.1, jnp.float32),
        "pt": jnp.asarray(rng.randn(B, L, 8) * 0.1, jnp.float32),
        "seeds": jnp.asarray(rng.randn(B, 16) * 0.01, jnp.float32),
    }
    tgts = {k: jnp.asarray(batch[k]) for k in (
        "center_label", "size_gts", "sem_cls_label", "positive_map",
        "box_label_mask", "point_instance_label", "text_mask",
    )}
    seed_inds = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None], (B, 1))
    seed_xyz = jnp.asarray(batch["point_clouds"][:, :16, :3])

    def build_ep(p):
        ep = dict(tgts)
        for i, pref in enumerate(["proposal_", "last_"]):
            ep[pref + "center"] = p["center"][i]
            ep[pref + "pred_size"] = jax.nn.softplus(p["size_raw"][i]) + 1e-4
            ep[pref + "sem_cls_scores"] = p["logits"][i]
            ep[pref + "proj_queries"] = p["pq"][i]
        ep["proj_tokens"] = p["pt"]
        ep["seeds_obj_cls_logits"] = p["seeds"]
        ep["seed_inds"] = seed_inds
        ep["seed_xyz"] = seed_xyz
        return ep

    def loss_fn(p):
        loss, ep = compute_hungarian_loss(build_ep(p), 1, ccfg, 4)
        return loss, (ep["loss_bbox"], ep["loss_giou"])

    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    @jax.jit
    def train(p, s):
        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss, parts

    first = None
    for i in range(300):
        params, opt_state, loss, (lb, lg) = train(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(lb) < 0.3, float(lb)
    assert float(lg) < 0.6, float(lg)
    assert float(loss) < first * 0.3
