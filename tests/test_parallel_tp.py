"""Tensor-parallel sharding rules + a (dp=2, mp=4) train step.

The reference has no model parallelism (DDP only, main_utils.py:310-313);
tp.py adds the Megatron-style mp axis the TPU mesh gives for free. The
rules test runs in the default tier (no compile); the end-to-end step is
heavy (a second flagship-structure XLA:CPU compile)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from butd_detr_tpu.parallel import (
    commit_tp,
    make_mesh,
    param_pspec,
    shard_batch,
    state_shardings,
)
from butd_detr_tpu.train import init_state, make_train_step
from butd_detr_tpu.train.step import build_model

from tests.test_train_step import tiny_setup


class _K:
    def __init__(self, key):
        self.key = key


def _leaf(*shape):
    return jax.ShapeDtypeStruct(shape, np.float32)


def test_param_pspec_rules():
    # attention projections: column-parallel qkv, row-parallel out
    path = [_K("decoder_0"), _K("cross_d"), _K("q_proj"), _K("kernel")]
    assert param_pspec(path, _leaf(288, 288)) == P(None, "mp")
    path[-1] = _K("bias")
    assert param_pspec(path, _leaf(288)) == P("mp")
    path[2] = _K("out_proj")
    path[-1] = _K("kernel")
    assert param_pspec(path, _leaf(288, 288)) == P("mp", None)
    path[-1] = _K("bias")
    assert param_pspec(path, _leaf(288)) == P()
    # ffn: Dense_0 column, Dense_1 row
    f0 = [_K("decoder_0"), _K("ffn"), _K("Dense_0"), _K("kernel")]
    assert param_pspec(f0, _leaf(288, 256)) == P(None, "mp")
    f1 = [_K("decoder_0"), _K("ffn"), _K("Dense_1"), _K("kernel")]
    assert param_pspec(f1, _leaf(256, 288)) == P("mp", None)
    # frozen trunk + backbone stay replicated
    t = [_K("text_encoder"), _K("layer_0"), _K("q_proj"), _K("kernel")]
    assert param_pspec(t, _leaf(768, 768)) == P()
    b = [_K("backbone_net"), _K("sa1"), _K("SharedMLP_0"), _K("Dense_0"),
         _K("kernel")]
    assert param_pspec(b, _leaf(6, 64)) == P()
    # optimizer-mirrored path (mu subtree prefix) hits the same rule
    m = [_K("0"), _K("mu"), _K("decoder_0"), _K("cross_d"), _K("v_proj"),
         _K("kernel")]
    assert param_pspec(m, _leaf(288, 288)) == P(None, "mp")


def test_state_shardings_divisibility_fallback():
    mesh = make_mesh(dp=2, mp=4)
    tree = {
        "decoder_0": {"cross_d": {"q_proj": {
            "kernel": np.zeros((288, 288), np.float32),
            "bias": np.zeros((288,), np.float32),
        }}},
        # 6 % 4 != 0 on the sharded dim -> replicated fallback
        "odd": {"ffn": {"Dense_0": {
            "kernel": np.zeros((288, 6), np.float32)}}},
    }
    ss = state_shardings(mesh, tree)
    assert ss["decoder_0"]["cross_d"]["q_proj"]["kernel"].spec == \
        P(None, "mp")
    assert ss["odd"]["ffn"]["Dense_0"]["kernel"].spec == P()


@pytest.mark.heavy
def test_tp_train_step_matches_dp():
    """TP (dp=2, mp=4) vs DP: forward outputs agree to bf16 tolerance and
    the TP step trains.

    The LOSSES are not compared tightly on purpose: the bf16 backbone's
    BatchNorm statistics reduce in different dp groupings (8-way vs
    2-way), the ~2e-3 output perturbation flips near-tied Hungarian
    assignments at random init, and a single flipped pair moves the loss
    by O(1) — a discreteness artifact, not a sharding defect (measured:
    23.29 vs 24.06 at init)."""
    import jax.numpy as jnp

    from butd_detr_tpu.parallel import commit_replicated
    from butd_detr_tpu.parallel.tp import shard_train_step_tp
    from butd_detr_tpu.train import shard_train_step
    from butd_detr_tpu.train.step import INPUT_KEYS

    cfg, model, batch, optimizer = tiny_setup(B=8)
    rng = jax.random.PRNGKey(0)
    train_step = make_train_step(model, cfg, optimizer)
    inputs = {k: jnp.asarray(batch[k]) for k in INPUT_KEYS if k in batch}

    def fwd(params, batch_stats, inp):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, inp,
            train=False)

    dp_mesh = make_mesh()
    state_dp = commit_replicated(
        dp_mesh, init_state(model, optimizer, batch, rng))
    out_dp = jax.jit(fwd)(
        state_dp.params, state_dp.batch_stats, shard_batch(dp_mesh, inputs))

    mesh = make_mesh(dp=2, mp=4)
    state = commit_tp(mesh, init_state(model, optimizer, batch, rng))
    # weights physically sharded: a qkv kernel holds (288, 288/4) shards
    qk = state.params["decoder_0"]["cross_d"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "mp")
    assert qk.addressable_shards[0].data.shape == (288, 72)

    out_tp = jax.jit(fwd)(
        state.params, state.batch_stats, shard_batch(mesh, inputs))
    for k in ("last_center", "last_pred_size", "last_sem_cls_scores",
              "proj_tokens"):
        a, b = np.asarray(out_dp[k]), np.asarray(out_tp[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 5e-3, (k, rel)

    step = shard_train_step_tp(train_step, mesh, state)
    sbatch = shard_batch(mesh, batch)
    state, metrics = step(state, sbatch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # updated params keep their tp layout (executable reuse across steps)
    qk2 = state.params["decoder_0"]["cross_d"]["q_proj"]["kernel"]
    assert qk2.sharding.spec == P(None, "mp")


@pytest.mark.heavy
def test_tp_trains_at_default_opt_level():
    """Multi-step TP training runs in a SUBPROCESS with default XLA:CPU
    optimization: under the suite's --xla_backend_optimization_level=0
    (compile-speed flag, conftest.py) the tiny-config backbone backward
    produces NaN grads at step 2 for one specific dropout draw — the
    identical program at the default opt level is finite for 8+ steps
    (bisected r3: all 27 non-finite grads in sa1-3 BN/Dense, transformer
    finite; an XLA:CPU opt-0 numerics artifact, not a sharding defect —
    production runs on TPU at default opt)."""
    import subprocess
    import sys

    driver = r"""
import os
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(f for f in flags.split()
                 if "backend_optimization_level" not in f
                 and "llvm_disable_expensive_passes" not in f)
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
import sys
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
import tempfile
cache = os.path.join(tempfile.gettempdir(), "butd_detr_tpu_jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import numpy as np
from tests.test_train_step import tiny_setup
from butd_detr_tpu.parallel import commit_tp, make_mesh, shard_batch
from butd_detr_tpu.parallel.tp import shard_train_step_tp
from butd_detr_tpu.train import init_state, make_train_step

cfg, model, batch, optimizer = tiny_setup(B=8)
rng = jax.random.PRNGKey(0)
mesh = make_mesh(dp=2, mp=4)
state = commit_tp(mesh, init_state(model, optimizer, batch, rng))
step = shard_train_step_tp(make_train_step(model, cfg, optimizer), mesh, state)
sb = shard_batch(mesh, batch)
losses = []
for _ in range(6):
    state, m = step(state, sb, rng)
    losses.append(float(m["loss"]))
assert all(np.isfinite(l) for l in losses), losses
assert min(losses[3:]) < losses[0], losses
print("TP6OK", losses)
"""
    import os.path as osp

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", driver % repo],
        capture_output=True, text=True, timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "TP6OK" in out.stdout, out.stdout[-1000:]
