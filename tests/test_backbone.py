"""Tests for NN blocks and the PointNet++ backbone."""

import numpy as np
import jax
import jax.numpy as jnp

from butd_detr_tpu.nn import (
    PointnetFPModule,
    PointnetSAModuleVotes,
    Pointnet2Backbone,
    SharedMLP,
)


def test_shared_mlp_shapes_and_bn_stats():
    m = SharedMLP([16, 32])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 4, 8), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, mutated = m.apply(x=x, variables=variables, train=True,
                         mutable=["batch_stats"])
    assert y.shape == (2, 10, 4, 32)
    # BN running stats must move away from init (mean 0 / var 1)
    ra_mean = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.abs(np.asarray(ra_mean)).sum() > 0

    # eval mode must not mutate stats
    y2 = m.apply(x=x, variables=variables, train=False)
    assert y2.shape == y.shape


def test_sa_module_geometry():
    """Grouped features pool only over points inside the ball."""
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.rand(2, 256, 3) * 4 + 1, jnp.float32)
    feats = jnp.asarray(rng.randn(2, 256, 6), jnp.float32)
    m = PointnetSAModuleVotes(
        npoint=32, radius=0.5, nsample=8, mlp=[16, 32],
        use_xyz=True, normalize_xyz=True,
    )
    variables = m.init(jax.random.PRNGKey(0), xyz, feats)
    (new_xyz, new_feats, inds), _ = m.apply(
        variables, xyz, feats, train=True, mutable=["batch_stats"]
    )
    assert new_xyz.shape == (2, 32, 3)
    assert new_feats.shape == (2, 32, 32)
    assert inds.shape == (2, 32) and inds.dtype == jnp.int32
    # centers are actual input points
    gathered = np.take_along_axis(
        np.asarray(xyz), np.asarray(inds)[..., None], axis=1
    )
    np.testing.assert_allclose(np.asarray(new_xyz), gathered)


def test_fp_module_interpolates_exactly_at_known_points():
    """When unknown == known, 3NN weight mass sits on the point itself."""
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.rand(1, 64, 3) * 4, jnp.float32)
    kfeats = jnp.asarray(rng.randn(1, 64, 8), jnp.float32)
    m = PointnetFPModule(mlp=[8])
    variables = m.init(jax.random.PRNGKey(0), xyz, xyz, None, kfeats)
    out = m.apply(variables, xyz, xyz, None, kfeats, train=False)
    assert out.shape == (1, 64, 8)


def test_backbone_end_points_schema():
    rng = np.random.RandomState(3)
    pc = jnp.asarray(rng.rand(2, 1024, 6) * 3 + 1, jnp.float32)
    bb = Pointnet2Backbone(
        input_feature_dim=3, npoints=(256, 128, 64, 32),
    )
    variables = bb.init(jax.random.PRNGKey(0), pc)
    ep, _ = bb.apply(variables, pc, train=True, mutable=["batch_stats"])

    assert ep["sa1_xyz"].shape == (2, 256, 3)
    assert ep["sa1_features"].shape == (2, 256, 128)
    assert ep["sa2_features"].shape == (2, 128, 256)
    assert ep["sa3_features"].shape == (2, 64, 256)
    assert ep["sa4_features"].shape == (2, 32, 256)
    assert ep["fp2_features"].shape == (2, 128, 288)
    assert ep["fp2_xyz"].shape == (2, 128, 3)
    assert ep["fp2_inds"].shape == (2, 128)
    # fp2_inds must be the first num_seed sa1 indices (backbone_module.py:142)
    np.testing.assert_array_equal(
        np.asarray(ep["fp2_inds"]), np.asarray(ep["sa1_inds"])[:, :128]
    )
    assert np.isfinite(np.asarray(ep["fp2_features"])).all()


def test_backbone_differentiable():
    """End-to-end grad through SA+FP stacks (gather/group/interp grads).

    jitted grad + small npoints: one fused XLA:CPU compile instead of
    eager per-op dispatch through four FPS loops (suite cold-time)."""
    rng = np.random.RandomState(4)
    pc = jnp.asarray(rng.rand(1, 256, 6) + 1, jnp.float32)
    bb = Pointnet2Backbone(input_feature_dim=3, npoints=(64, 32, 16, 8))
    variables = jax.jit(bb.init)(jax.random.PRNGKey(0), pc)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(p):
        ep, _ = bb.apply(
            {"params": p, "batch_stats": batch_stats}, pc,
            train=True, mutable=["batch_stats"],
        )
        return jnp.sum(ep["fp2_features"] ** 2)

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_sa_module_msg_and_groupall():
    """MSG set abstraction + GroupAll global pooling
    (reference pointnet2_modules.py:78-124, pointnet2_utils.py:379-426)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from butd_detr_tpu.nn import GroupAll, PointnetSAModuleMSG

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(2, 64, 3) * 2 + 1, jnp.float32)
    feats = jnp.asarray(rng.rand(2, 64, 8), jnp.float32)

    msg = PointnetSAModuleMSG(
        npoint=16, radii=(0.5, 1.0), nsamples=(8, 4),
        mlps=((16, 32), (16, 16)),
    )
    v = msg.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats, inds = msg.apply(v, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 48)  # 32 + 16 concat
    assert inds.shape == (2, 16)

    # GroupAll path (npoint=None): one global group
    glob = PointnetSAModuleMSG(
        npoint=None, radii=(None,), nsamples=(None,), mlps=((16, 24),),
    )
    v2 = glob.init(jax.random.PRNGKey(1), xyz, feats)
    nx, nf, _ = glob.apply(v2, xyz, feats)
    assert nx is None and nf.shape == (2, 1, 24)

    grouped, gxyz = GroupAll()(xyz, None, feats)
    assert grouped.shape == (2, 1, 64, 11)


def test_lfp_module_msg():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from butd_detr_tpu.nn import PointnetLFPModuleMSG

    rng = np.random.RandomState(1)
    xyz1 = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
    xyz2 = jnp.asarray(rng.rand(2, 16, 3), jnp.float32)
    f1 = jnp.asarray(rng.rand(2, 64, 8), jnp.float32)
    f2 = jnp.asarray(rng.rand(2, 16, 4), jnp.float32)
    lfp = PointnetLFPModuleMSG(
        radii=(0.5,), nsamples=(8,), mlps=((16,),), post_mlp=(12,),
    )
    v = lfp.init(jax.random.PRNGKey(0), xyz2, xyz1, f2, f1)
    out = lfp.apply(v, xyz2, xyz1, f2, f1)
    assert out.shape == (2, 16, 12)
