"""Inference API tests: GroundingPredictor + the predict.py CLI.

The reference has no inference entry point (predictions only exist inside
its eval loops); this surface is framework-original. Runs on the CPU mesh
with the tiny config so the forward compile is shared with the rest of
the suite where possible.
"""

import json
import sys

import numpy as np
import pytest
import jax

from butd_detr_tpu.data.synthetic import make_fake_scannet
from butd_detr_tpu.lang import tiny_roberta_config
from butd_detr_tpu.lang.tokenizer import SimpleTokenizer
from butd_detr_tpu.predict import GroundingPredictor, prepare_point_cloud

from test_train_step import tiny_setup


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg, model, batch, optimizer = tiny_setup(B=8)
    from butd_detr_tpu.train.step import init_state

    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    tok = SimpleTokenizer(max_len=cfg.max_text_len)
    pred = GroundingPredictor(
        cfg, {"params": state.params, "batch_stats": state.batch_stats},
        tok, roberta_config=tiny_roberta_config(),
        backbone_npoints=(64, 32, 16, 8),
    )
    return cfg, pred, state


def test_prepare_point_cloud_shapes():
    rng = np.random.RandomState(0)
    pc = rng.rand(5000, 6).astype(np.float32)
    out = prepare_point_cloud(pc, 1024, use_color=True)
    assert out.shape == (1024, 6)
    out2 = prepare_point_cloud(pc[:100], 1024, use_color=False)
    assert out2.shape == (1024, 3)  # upsamples with replacement
    with pytest.raises(ValueError):
        prepare_point_cloud(pc[:, :3], 256, use_color=True)


def test_predict_returns_ranked_boxes(tiny_predictor):
    cfg, pred, _ = tiny_predictor
    rng = np.random.RandomState(1)
    cloud = np.concatenate(
        [rng.rand(2000, 3) * 4, rng.rand(2000, 3)], axis=1
    ).astype(np.float32)
    out = pred.predict(
        cloud, "the chair near the table", phrase="chair", top_k=5,
    )
    assert out["boxes"].shape == (5, 6)
    assert out["scores"].shape == (5,)
    assert np.isfinite(out["boxes"]).all()
    # ranked descending
    assert (np.diff(out["scores"]) <= 1e-6).all()
    # both scoring modes work
    out2 = pred.predict(
        cloud, "the chair near the table", phrase="chair",
        mode="bbs", top_k=3,
    )
    assert out2["boxes"].shape == (3, 6)


def test_predict_missing_phrase_raises(tiny_predictor):
    cfg, pred, _ = tiny_predictor
    cloud = np.random.RandomState(2).rand(500, 6).astype(np.float32)
    with pytest.raises(ValueError):
        pred.predict(cloud, "the chair", phrase="sofa")


def test_predictor_from_orbax_checkpoint(tiny_predictor, tmp_path):
    """from_checkpoint restores the exact params the state was saved with."""
    from butd_detr_tpu.train.checkpoint import save_checkpoint

    cfg, pred, state = tiny_predictor
    path = save_checkpoint(str(tmp_path), 1, state)
    tok = SimpleTokenizer(max_len=cfg.max_text_len)
    pred2 = GroundingPredictor.from_checkpoint(
        cfg, path, tok, roberta_config=tiny_roberta_config(),
        backbone_npoints=(64, 32, 16, 8),
    )
    a = jax.tree_util.tree_leaves(pred.variables["params"])
    b = jax.tree_util.tree_leaves(pred2.variables["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.heavy
def test_predict_cli_end_to_end(tmp_path):
    """predict.py CLI: fake scan + saved checkpoint -> JSON boxes.
    Heavy tier: its own subprocess pays a fresh jit of the tiny model."""
    root = make_fake_scannet(
        str(tmp_path / "data"), scan_ids=["scene0000_00"],
        points_per_scan=1500,
    )
    cfg, model, batch, optimizer = tiny_setup(B=8)
    from butd_detr_tpu.train.checkpoint import save_checkpoint
    from butd_detr_tpu.train.step import init_state

    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "log"), 1, state)

    # drive main() in-process (the CPU-mesh platform is already set up by
    # conftest; a subprocess would pay a separate jit)
    import predict as cli

    out_json = None

    class _Cap:
        def write(self, s):
            nonlocal out_json
            s = s.strip()
            if s.startswith("{"):
                out_json = s

        def flush(self):
            pass

    old = sys.stdout
    sys.stdout = _Cap()
    try:
        cli.main([
            "--scan_id", "scene0000_00",
            "--utterance", "the chair near the table",
            "--phrase", "chair",
            "--data_root", root,
            "--checkpoint_path", ckpt,
            "--num_points", "256",
            "--max_text_len", "12",
            "--num_encoder_layers", "1",
            "--num_decoder_layers", "1",
            "--num_target", "16",
            "--max_num_obj", "8",
            "--max_det_boxes", "8",
            "--use_color",
            "--self_attend",
            "--use_soft_token_loss",
            "--use_contrastive_align",
            "--butd",
            "--tiny_roberta",
            "--backbone_npoints", "64", "32", "16", "8",
        ])
    finally:
        sys.stdout = old
    out = json.loads(out_json)
    assert len(out["boxes_cxcyczwhd"]) == 10
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_predict_mode_validation(tiny_predictor):
    cfg, pred, _ = tiny_predictor
    cloud = np.random.RandomState(3).rand(500, 6).astype(np.float32)
    with pytest.raises(ValueError):
        pred.predict(cloud, "the chair", phrase="chair", mode="nope")
    # bbf against a non-contrastive checkpoint must fail loudly
    import dataclasses

    pred2 = GroundingPredictor(
        dataclasses.replace(cfg, use_contrastive_align=False),
        pred.variables, pred.tokenizer,
        roberta_config=tiny_roberta_config(),
        backbone_npoints=(64, 32, 16, 8),
    )
    with pytest.raises(ValueError):
        pred2.predict(cloud, "the chair", phrase="chair", mode="bbf")


def test_predict_phrase_past_max_text_len_raises(tiny_predictor):
    """Spans whose tokens land past the model's max_text_len window score
    zero everywhere — must raise, not silently return arbitrary boxes."""
    cfg, pred, _ = tiny_predictor
    cloud = np.random.RandomState(4).rand(500, 6).astype(np.float32)
    long_utt = " ".join(["word"] * (cfg.max_text_len + 4)) + " chair"
    with pytest.raises(ValueError):
        pred.predict(cloud, long_utt, phrase="chair")
