"""Pretrained-initialization tests (reference bdetr.py:60-94): roberta-base
trunk from a weights file, GroupFree PointNet++ via pp_checkpoint with
strict=False semantics, and the class_embeddings3d.npy table."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from butd_detr_tpu.data.synthetic import synthetic_batch
from butd_detr_tpu.lang import RobertaModel, tiny_roberta_config
from butd_detr_tpu.train import Config
from butd_detr_tpu.train.pretrained import (
    apply_pretrained_init,
    init_class_embeddings,
    init_pointnet_backbone,
    init_text_encoder,
)
from butd_detr_tpu.train.step import build_model, init_state
from butd_detr_tpu.train.optimizer import make_optimizer
from butd_detr_tpu.train.torch_convert import flatten

torch = pytest.importorskip("torch")


def tiny_cfg(**kw):
    kw.setdefault("use_contrastive_align", True)
    kw.setdefault("use_soft_token_loss", True)
    kw.setdefault("butd", True)
    kw.setdefault("num_encoder_layers", 1)
    kw.setdefault("num_decoder_layers", 2)
    kw.setdefault("num_target", 16)
    kw.setdefault("max_text_len", 12)
    kw.setdefault("num_points", 256)
    kw.setdefault("max_num_obj", 8)
    kw.setdefault("max_det_boxes", 8)
    return Config(**kw)


@pytest.fixture(scope="module")
def tiny_state():
    """Template state via eval_shape (no forward compile: pretrained-init
    only needs shapes/dtypes) filled with distinct random values so
    'leaf untouched' assertions stay meaningful."""
    import jax.numpy as jnp

    from butd_detr_tpu.train.step import TrainState

    cfg = tiny_cfg()
    model = build_model(
        cfg, roberta_config=tiny_roberta_config(),
        backbone_npoints=(64, 32, 16, 8),
    )
    batch = synthetic_batch(
        batch_size=2, num_points=256, max_text_len=12, max_num_obj=8,
        max_det_boxes=8, n_true_objects=3, n_true_tokens=6, n_true_det=4,
    )
    from butd_detr_tpu.train.step import INPUT_KEYS

    inputs = {k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch}
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), inputs)
    )
    rng = np.random.default_rng(42)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(s.dtype)
            if np.issubdtype(s.dtype, np.floating)
            else np.zeros(s.shape, s.dtype)
        ),
        shapes,
    )
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )
    return cfg, model, state


def make_hf_roberta():
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel as HFRoberta

    hf_cfg = HFConfig(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
    )
    torch.manual_seed(7)
    return HFRoberta(hf_cfg, add_pooling_layer=False).eval()


def test_init_text_encoder_from_torch_file(tiny_state, tmp_path):
    """Reference bdetr.py:73-77: the trunk starts from pretrained weights.
    Loading a torch-saved HF state dict must reproduce the HF forward."""
    cfg, model, state = tiny_state
    hf = make_hf_roberta()
    path = str(tmp_path / "roberta_tiny.pth")
    torch.save(hf.state_dict(), path)

    params, ok = init_text_encoder(
        state.params, path, tiny_roberta_config()
    )
    assert ok

    ids = np.array([[0, 5, 6, 7, 8, 2, 1, 1]], np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        RobertaModel(tiny_roberta_config()).apply(
            {"params": params["text_encoder"]},
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-4)
    # non-text params untouched
    np.testing.assert_array_equal(
        np.asarray(params["butd_class_embeddings"]),
        np.asarray(state.params["butd_class_embeddings"]),
    )


def _fake_groupfree_sd(params, batch_stats, rng):
    """Reference-named torch state dict covering our backbone leaves,
    built by inverting torch_convert's layout conventions."""
    sd = {}
    arrays = {}
    for tree in (params, batch_stats):
        for path, leaf in flatten({"backbone_net": tree["backbone_net"]}).items():
            mod, _, block = path[1], path[2], path[3]
            attr = "mlp_module" if mod.startswith("sa") else "mlp"
            kind, idx = block.split("_")
            layer = f"{mod}.{attr}.layer{idx}"
            leaf_name = path[-1]
            val = rng.standard_normal(np.asarray(leaf).shape).astype(
                np.float32
            )
            if kind == "Dense":
                key = f"{layer}.conv." + (
                    "weight" if leaf_name == "kernel" else "bias"
                )
                t = val.T[..., None, None] if leaf_name == "kernel" else val
            else:
                names = {"scale": "weight", "bias": "bias",
                         "mean": "running_mean", "var": "running_var"}
                key = f"{layer}.bn.bn.{names[leaf_name]}"
                t = val
            sd[key] = torch.tensor(t)
            arrays[path] = val
    return sd, arrays


def test_init_pointnet_backbone_strict_false(tiny_state, tmp_path):
    """Reference bdetr.py:66-71: pp_checkpoint loads with strict=False."""
    cfg, model, state = tiny_state
    rng = np.random.default_rng(0)
    sd, arrays = _fake_groupfree_sd(state.params, state.batch_stats, rng)

    # drop one key: that leaf must keep its random init (strict=False)
    dropped = "sa1.mlp_module.layer0.conv.weight"
    assert dropped in sd
    partial = {k: v for k, v in sd.items() if k != dropped}
    path = str(tmp_path / "gf_backbone.pth")
    torch.save(partial, path)

    params, stats, n_ok, n_skip = init_pointnet_backbone(
        state.params, state.batch_stats, path
    )
    assert n_ok > 0 and n_skip == 1
    got = flatten({"backbone_net": params["backbone_net"]})
    got.update(flatten({"backbone_net": stats["backbone_net"]}))
    for p, want in arrays.items():
        if p == ("backbone_net", "sa1", "mlp", "Dense_0", "kernel"):
            continue
        if "sa1" in p and "Dense_0" in p and p[-1] == "kernel":
            # the dropped leaf: still the original init
            np.testing.assert_array_equal(
                np.asarray(got[p]),
                np.asarray(
                    flatten({"backbone_net": state.params["backbone_net"]})[p]
                ),
            )
            continue
        np.testing.assert_allclose(np.asarray(got[p]), want, atol=1e-6)


def test_init_pointnet_full_checkpoint_roundtrip(tiny_state, tmp_path):
    """A complete GroupFree-style dict fills every backbone leaf, also when
    wrapped in {'model': ...} + 'module.' prefixes."""
    cfg, model, state = tiny_state
    rng = np.random.default_rng(1)
    sd, arrays = _fake_groupfree_sd(state.params, state.batch_stats, rng)
    wrapped = {"model": {f"module.{k}": v for k, v in sd.items()}}
    path = str(tmp_path / "gf_full.pth")
    torch.save(wrapped, path)
    params, stats, n_ok, n_skip = init_pointnet_backbone(
        state.params, state.batch_stats, path
    )
    assert n_skip == 0
    assert n_ok == len(arrays)


def test_init_class_embeddings(tiny_state, tmp_path):
    cfg, model, state = tiny_state
    table = np.random.default_rng(2).standard_normal(
        np.asarray(state.params["butd_class_embeddings"]).shape
    ).astype(np.float32)
    path = str(tmp_path / "class_embeddings3d.npy")
    np.save(path, table)
    params, ok = init_class_embeddings(state.params, path)
    assert ok
    np.testing.assert_array_equal(
        np.asarray(params["butd_class_embeddings"]), table
    )
    # wrong shape raises loudly
    np.save(path, table[:, :4])
    with pytest.raises(ValueError):
        init_class_embeddings(state.params, path)


def test_apply_pretrained_init_end_to_end(tiny_state, tmp_path):
    """All three sources through the harness-facing entry point."""
    cfg, model, state = tiny_state
    hf = make_hf_roberta()
    torch.save(hf.state_dict(), str(tmp_path / "roberta.pth"))
    rng = np.random.default_rng(3)
    sd, _ = _fake_groupfree_sd(state.params, state.batch_stats, rng)
    torch.save(sd, str(tmp_path / "gf.pth"))
    table = rng.standard_normal(
        np.asarray(state.params["butd_class_embeddings"]).shape
    ).astype(np.float32)
    np.save(str(tmp_path / "class_embeddings3d.npy"), table)

    cfg2 = dataclasses.replace(
        cfg,
        roberta_checkpoint=str(tmp_path / "roberta.pth"),
        pp_checkpoint=str(tmp_path / "gf.pth"),
        data_root=str(tmp_path),
        use_color=True,  # input_feature_dim == 3: reference's load gate
    )
    state2, report = apply_pretrained_init(
        state, cfg2, roberta_config=tiny_roberta_config()
    )
    assert report["text_encoder"] == "loaded"
    assert report["backbone_net"].startswith("loaded")
    assert report["butd_class_embeddings"] == "loaded"
    np.testing.assert_array_equal(
        np.asarray(state2.params["butd_class_embeddings"]), table
    )
    # the reference gate: no pp load when extra channels != 3
    cfg3 = dataclasses.replace(cfg2, use_color=False)
    _, report3 = apply_pretrained_init(
        state, cfg3, roberta_config=tiny_roberta_config()
    )
    assert report3["backbone_net"].startswith("skipped")

    # missing roberta source degrades loudly but does not crash
    cfg4 = dataclasses.replace(
        cfg2, roberta_checkpoint=str(tmp_path / "nope.pth")
    )
    _, report4 = apply_pretrained_init(
        state, cfg4, roberta_config=tiny_roberta_config()
    )
    assert report4["text_encoder"].startswith("skipped")
