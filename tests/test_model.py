"""Full-model tests: BeaUTyDETR forward schema, masks, grads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from butd_detr_tpu.lang import tiny_roberta_config
from butd_detr_tpu.models import BeaUTyDETR, prediction_prefixes

pytestmark = pytest.mark.heavy  # flagship-shape compiles (opt-in tier)


def tiny_model(**kw):
    defaults = dict(
        num_class=32,
        num_obj_class=16,
        input_feature_dim=3,
        num_queries=24,
        num_decoder_layers=2,
        d_model=64,
        box_emb_dim=32,
        text_hidden=64,
        roberta=tiny_roberta_config(),
        backbone_npoints=(128, 64, 32, 16),
    )
    defaults.update(kw)
    return BeaUTyDETR(**defaults)


def tiny_inputs(B=2, N=512, L=12, D=8, seed=0):
    rng = np.random.RandomState(seed)
    ids = np.full((B, L), 1, np.int32)
    ids[:, 0] = 0
    ids[:, 1:5] = rng.randint(4, 1000, (B, 4))
    ids[:, 5] = 2
    mask = (ids != 1).astype(np.int32)
    det_mask = np.zeros((B, D), bool)
    det_mask[:, :5] = True
    return {
        "point_clouds": jnp.asarray(
            rng.rand(B, N, 6).astype(np.float32) * 3 + 1
        ),
        "text_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "det_boxes": jnp.asarray(rng.rand(B, D, 6).astype(np.float32)),
        "det_class_ids": jnp.asarray(
            rng.randint(0, 16, (B, D)).astype(np.int32)
        ),
        "det_bbox_label_mask": jnp.asarray(det_mask),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    inputs = tiny_inputs()
    variables = model.init(jax.random.PRNGKey(0), inputs)
    return model, variables, inputs


def test_end_points_schema(model_and_vars):
    model, variables, inputs = model_and_vars
    ep = model.apply(variables, inputs, train=False)
    B, Q = 2, 24
    prefixes = prediction_prefixes(2)
    assert prefixes == ["proposal_", "0head_", "last_"]
    for p in prefixes:
        assert ep[p + "center"].shape == (B, Q, 3)
        assert ep[p + "pred_size"].shape == (B, Q, 3)
        assert ep[p + "sem_cls_scores"].shape == (B, Q, 32)
        assert ep[p + "proj_queries"].shape == (B, Q, 64)
    assert ep["proj_tokens"].shape == (B, 12, 64)
    assert ep["seeds_obj_cls_logits"].shape == (B, 64)  # fp2 seeds
    assert ep["query_points_sample_inds"].shape == (B, Q)
    # contrastive projections are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ep["last_proj_queries"]), axis=-1),
        1.0, atol=1e-4,
    )


def test_center_is_base_plus_residual(model_and_vars):
    model, variables, inputs = model_and_vars
    ep = model.apply(variables, inputs, train=False)
    # proposal base_xyz must equal query_points_xyz (cluster centers)
    np.testing.assert_allclose(
        np.asarray(ep["proposal_base_xyz"]),
        np.asarray(ep["query_points_xyz"]),
    )
    # every decoder head re-predicts from cluster_xyz too (bdetr.py:310-314)
    np.testing.assert_allclose(
        np.asarray(ep["last_base_xyz"]),
        np.asarray(ep["query_points_xyz"]),
    )


def test_text_padding_does_not_leak(model_and_vars):
    model, variables, inputs = model_and_vars
    ep1 = model.apply(variables, inputs, train=False)
    inputs2 = dict(inputs)
    ids2 = np.asarray(inputs["text_ids"]).copy()
    ids2[:, -1] = 77  # change a PAD slot's id (mask unchanged)
    inputs2["text_ids"] = jnp.asarray(ids2)
    ep2 = model.apply(inputs=inputs2, variables=variables, train=False)
    np.testing.assert_allclose(
        np.asarray(ep1["last_center"]), np.asarray(ep2["last_center"]),
        atol=1e-5,
    )


def test_butd_box_stream_affects_output(model_and_vars):
    model, variables, inputs = model_and_vars
    ep1 = model.apply(variables, inputs, train=False)
    inputs2 = dict(inputs)
    inputs2["det_boxes"] = inputs["det_boxes"] + 0.5
    ep2 = model.apply(inputs=inputs2, variables=variables, train=False)
    assert np.abs(
        np.asarray(ep1["last_center"]) - np.asarray(ep2["last_center"])
    ).max() > 1e-6


def test_frozen_text_encoder_gets_no_grad(model_and_vars):
    model, variables, inputs = model_and_vars
    params = variables["params"]
    bs = variables["batch_stats"]

    def loss_fn(p):
        ep, _ = model.apply(
            {"params": p, "batch_stats": bs}, inputs,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return (
            jnp.sum(ep["last_center"] ** 2)
            + jnp.sum(ep["last_sem_cls_scores"] ** 2)
            + jnp.sum(ep["last_proj_queries"] ** 2)
        )

    g = jax.grad(loss_fn)(params)
    gt = sum(
        float(jnp.abs(l).sum())
        for l in jax.tree_util.tree_leaves(g["text_encoder"])
    )
    assert gt == 0.0  # frozen trunk (requires_grad=False parity)
    gp = float(jnp.abs(g["text_projector"]["kernel"]).sum())
    assert gp > 0  # projector trains
    gb = sum(
        float(jnp.abs(l).sum())
        for l in jax.tree_util.tree_leaves(g["backbone_net"])
    )
    assert gb > 0


def test_no_butd_variant():
    model = tiny_model(butd=False)
    inputs = tiny_inputs()
    variables = model.init(jax.random.PRNGKey(0), inputs)
    ep = model.apply(variables, inputs, train=False)
    assert "last_center" in ep
    assert "butd_class_embeddings" not in variables["params"]
