"""Train-step tests on the 8-device virtual CPU dp mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from butd_detr_tpu.data.synthetic import synthetic_batch
from butd_detr_tpu.lang import tiny_roberta_config
from butd_detr_tpu.parallel import (
    commit_replicated,
    make_mesh,
    shard_batch,
)
from butd_detr_tpu.train import (
    Config,
    TrainState,
    init_state,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
    shard_eval_step,
    shard_train_step,
)
from butd_detr_tpu.train.step import build_model


def tiny_setup(B=8):
    # 1 encoder + 1 decoder layer: the cross-encoder dominates the
    # train-step HLO (~20k of 124k instructions at 3+2 layers) and this
    # container compiles XLA:CPU on a single core — layer count is the
    # compile-time lever. The multi-layer prefix logic (ihead_*) is
    # covered by the CPU criterion tests and the heavy tier.
    cfg = Config(
        use_contrastive_align=True,
        use_soft_token_loss=True,
        butd=True,
        self_attend=True,
        num_encoder_layers=1,
        num_decoder_layers=1,
        num_target=16,
        batch_size=B,
        max_text_len=12,
        num_points=256,
        max_num_obj=8,
        max_det_boxes=8,
        # use_color=True + steps_per_epoch=1: matches the harness tests'
        # tiny_config (6-channel clouds from the fake dataset, 1-step
        # epochs), so the train-step HLO — and its multi-minute XLA:CPU
        # compile — is shared across the suite via the persistent cache
        use_color=True,
    )
    model = build_model(
        cfg, roberta_config=tiny_roberta_config(),
        backbone_npoints=(64, 32, 16, 8),
    )
    batch = synthetic_batch(
        batch_size=B, num_points=256, max_text_len=12, max_num_obj=8,
        max_det_boxes=8, n_true_objects=3, n_true_tokens=6, n_true_det=4,
    )
    optimizer = make_optimizer(cfg, steps_per_epoch=1)
    return cfg, model, batch, optimizer


def test_schedules():
    cfg = Config(lr_decay_epochs=[2, 4], lr_decay_rate=0.1,
                 warmup_epoch=1, warmup_multiplier=100, lr=1.0)
    sched = make_schedule(1.0, steps_per_epoch=10, cfg=cfg)
    # warmup: step 0 -> lr/100; step 10 (=warmup end) -> ~lr
    assert abs(float(sched(0)) - 0.01) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    # milestones offset by warmup: decay at (2-1)*10 steps after warmup
    assert abs(float(sched(11 + 10)) - 0.1) < 1e-6
    assert abs(float(sched(11 + 30)) - 0.01) < 1e-6

    cfg2 = Config(lr_scheduler="cosine", max_epoch=10, warmup_epoch=-1)
    sched2 = make_schedule(1.0, steps_per_epoch=10, cfg=cfg2)
    assert abs(float(sched2(0)) - 1.0) < 1e-5
    assert float(sched2(100)) < 1e-5


@pytest.fixture(scope="module")
def mesh_run():
    """One shared compile+train run for all dp-mesh assertions: this
    graph costs minutes to build on the single-core XLA:CPU of this
    container, so every mesh test reads from the same 4-step run."""
    cfg, model, batch, optimizer = tiny_setup(B=8)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    state0 = commit_replicated(mesh, init_state(model, optimizer, batch, rng))
    step = shard_train_step(make_train_step(model, cfg, optimizer), mesh)
    sbatch = shard_batch(mesh, batch)
    params0 = jax.device_get(state0.params)
    state = state0
    losses, metrics = [], None
    for i in range(4):
        state, metrics = step(state, sbatch, rng)
        losses.append(float(metrics["loss"]))
    return dict(
        cfg=cfg, model=model, batch=batch, optimizer=optimizer, mesh=mesh,
        sbatch=sbatch, params0=params0, state=state, losses=losses,
        metrics=metrics,
    )


def test_train_step_runs_and_learns_on_dp_mesh(mesh_run):
    assert mesh_run["mesh"].devices.size == 8
    losses = mesh_run["losses"]
    assert all(np.isfinite(l) for l in losses)
    assert int(mesh_run["state"].step) == 4
    # optimizing the same batch must reduce the loss
    assert losses[-1] < losses[0]
    # grad clipping: global grad norm metric present and finite
    assert np.isfinite(float(mesh_run["metrics"]["grad_norm"]))


def test_frozen_text_encoder_params_unchanged(mesh_run):
    before = mesh_run["params0"]["text_encoder"]
    after = jax.device_get(mesh_run["state"].params["text_encoder"])
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(a, b)
    # but the main trunk did move
    assert not np.allclose(
        jax.device_get(mesh_run["state"].params["decoder_query_proj"]["kernel"]),
        mesh_run["params0"]["decoder_query_proj"]["kernel"],
    )


def test_eval_step_matches_schema(mesh_run):
    estep = shard_eval_step(
        make_eval_step(mesh_run["model"], mesh_run["cfg"]), mesh_run["mesh"]
    )
    ep = estep(mesh_run["state"], mesh_run["sbatch"])
    assert ep["last_center"].shape == (8, 16, 3)
    assert np.isfinite(float(ep["loss"]))


def test_checkpoint_save_restore_roundtrip(mesh_run, tmp_path):
    """orbax save -> load recovers the exact state tree (the full
    TrainTester train->ckpt->resume->eval cycle runs in the heavy tier,
    tests/test_harness.py)."""
    from butd_detr_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )

    state = mesh_run["state"]
    path = save_checkpoint(str(tmp_path), 3, state)
    assert latest_checkpoint(str(tmp_path)) == path
    restored, start_epoch = load_checkpoint(path, jax.tree_util.tree_map(
        lambda x: np.zeros_like(x), state
    ))
    assert int(start_epoch) == 4  # resume AFTER the saved epoch
    for a, b in zip(
        jax.tree_util.tree_leaves(state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unfreeze_text_encoder_flows_gradients():
    """freeze_text_encoder=False must actually let grads reach the trunk
    (the frozen default stop_gradients it, reference bdetr.py:76-77).
    Compile-light: grad of a forward-output sum — gradient FLOW to the
    trunk needs no loss stack."""
    from butd_detr_tpu.train.step import INPUT_KEYS

    cfg, _, batch, _ = tiny_setup(B=2)
    inputs = {k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch}

    def text_grad_norm(freeze):
        cfg.freeze_text_encoder = freeze
        m = build_model(cfg, roberta_config=tiny_roberta_config(),
                        backbone_npoints=(64, 32, 16, 8))
        # shape-only random init (no eager init run) — the tested property
        # is gradient FLOW, which only needs nonzero weights
        shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), inputs))
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        variables = jax.tree_util.tree_unflatten(treedef, [
            (jax.random.normal(k, s.shape, s.dtype) * 0.02
             if jnp.issubdtype(s.dtype, jnp.floating)
             else jnp.zeros(s.shape, s.dtype))
            for k, s in zip(keys, leaves)
        ])

        # grad of sum(text_feats²) w.r.t. the text trunk only: under jit,
        # XLA dead-code-eliminates the visual branch, so each arm compiles
        # just the text path (suite cold-time)
        def loss_fn(text_params):
            params = {**variables["params"], "text_encoder": text_params}
            ep = m.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                inputs, train=False,
            )
            return jnp.sum(ep["text_feats"].astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss_fn))(variables["params"]["text_encoder"])
        return float(
            sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(g))
        )

    assert text_grad_norm(freeze=True) == 0.0
    assert text_grad_norm(freeze=False) > 0.0


def test_backbone_bf16_option_keeps_f32_interface():
    """backbone_dtype=bf16 runs the PointNet++ MLPs in bf16 but the
    end_points surface (and everything downstream) stays f32."""
    import jax
    import jax.numpy as jnp

    from butd_detr_tpu.data.synthetic import synthetic_batch
    from butd_detr_tpu.lang import tiny_roberta_config
    from butd_detr_tpu.train import Config
    from butd_detr_tpu.train.step import INPUT_KEYS, build_model

    cfg = Config(
        use_contrastive_align=True, use_soft_token_loss=True, butd=True,
        self_attend=True, num_encoder_layers=1, num_decoder_layers=1,
        num_target=8, max_text_len=12, num_points=128, max_num_obj=4,
        max_det_boxes=4, use_color=False, backbone_bf16=True,
    )
    model = build_model(cfg, roberta_config=tiny_roberta_config(),
                        backbone_npoints=(32, 16, 8, 8))
    batch = synthetic_batch(batch_size=2, num_points=128, max_text_len=12,
                            max_num_obj=4, max_det_boxes=4,
                            n_true_objects=2, n_true_tokens=4, n_true_det=2)
    inputs = {k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch}
    # dtype propagation is static: eval_shape proves the f32 surface with
    # no eager init/apply (suite cold-time)
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), inputs)
    )
    # params stay f32 (flax param_dtype default); only compute is bf16
    for leaf in jax.tree_util.tree_leaves(var_shapes["params"]):
        assert leaf.dtype == jnp.float32
    ep_shapes = jax.eval_shape(
        lambda v: model.apply(v, inputs, train=False), var_shapes
    )
    assert ep_shapes["fp2_features"].dtype == jnp.float32
    assert ep_shapes["last_center"].dtype == jnp.float32

    # one real jitted run: bf16 compute must stay finite. Random params,
    # but proper BN stats (mean 0, var 1 — a random negative "var" would
    # NaN the rsqrt).
    leaves, treedef = jax.tree_util.tree_flatten(var_shapes["params"])
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        (jax.random.normal(k, s.shape, s.dtype) * 0.02
         if jnp.issubdtype(s.dtype, jnp.floating)
         else jnp.zeros(s.shape, s.dtype))
        for k, s in zip(keys, leaves)
    ])
    stats = jax.tree_util.tree_map_with_path(
        lambda path, s: (
            jnp.ones(s.shape, s.dtype)
            if any(getattr(p, "key", None) == "var" for p in path)
            else jnp.zeros(s.shape, s.dtype)
        ),
        var_shapes["batch_stats"],
    )
    variables = {"params": params, "batch_stats": stats}
    ep = jax.jit(
        lambda v, i: model.apply(v, i, train=False)
    )(variables, inputs)
    assert bool(jnp.isfinite(ep["last_center"]).all())


def test_parse_config_reference_flags_and_negation():
    """CLI keeps the reference's positive flag names (main_utils.py:31-119)
    and adds --no-<flag> so True-by-default booleans can be disabled."""
    from butd_detr_tpu.train.config import parse_config

    c = parse_config([
        "--butd", "--use_color", "--batch_size", "4",
        "--lr_decay_epochs", "25", "26", "--unknown_flag_is_ignored",
    ])
    assert c.butd and c.use_color and c.batch_size == 4
    assert c.lr_decay_epochs == [25, 26]
    assert not parse_config(["--butd", "--no-butd"]).butd
    assert not parse_config(["--no-freeze_text_encoder"]).freeze_text_encoder
