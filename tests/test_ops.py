"""Unit tests for point-cloud ops vs. numpy oracles.

The oracles re-derive the exact CUDA-kernel semantics of the reference
(sampling_gpu.cu, ball_query_gpu.cu, interpolate_gpu.cu, group_points_gpu.cu)
as straightforward sequential numpy, so any behavioral drift in the XLA/Pallas
implementations is caught on CPU without hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from butd_detr_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


# ---------------------------------------------------------------- oracles


def fps_oracle(xyz, m):
    """Sequential FPS with the mag<=1e-3 skip and temp init 1e10."""
    B, N, _ = xyz.shape
    out = np.zeros((B, m), np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, np.float32)
        mag = (xyz[b] ** 2).sum(-1)
        valid = mag > 1e-3
        old = 0
        out[b, 0] = 0
        for j in range(1, m):
            best, besti = -1.0, 0
            d = ((xyz[b] - xyz[b, old]) ** 2).sum(-1)
            d2 = np.minimum(d, temp)
            temp[valid] = d2[valid]
            for k in range(N):
                if not valid[k]:
                    continue
                if d2[k] > best:
                    best, besti = d2[k], k
            old = besti
            out[b, j] = old
    return out


def ball_query_oracle(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    m = new_xyz.shape[1]
    out = np.zeros((B, m, nsample), np.int32)
    r2 = radius * radius
    for b in range(B):
        for j in range(m):
            cnt = 0
            for k in range(N):
                if cnt >= nsample:
                    break
                d2 = ((new_xyz[b, j] - xyz[b, k]) ** 2).sum()
                if d2 < r2:
                    if cnt == 0:
                        out[b, j, :] = k
                    out[b, j, cnt] = k
                    cnt += 1
    return out


def three_nn_oracle(unknown, known):
    B, n, _ = unknown.shape
    dist = np.zeros((B, n, 3), np.float32)
    idx = np.zeros((B, n, 3), np.int32)
    for b in range(B):
        d2 = ((unknown[b][:, None] - known[b][None]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[b] = order
        dist[b] = np.sqrt(np.take_along_axis(d2, order, axis=1))
    return dist, idx


# ------------------------------------------------------------------ tests


def test_fps_matches_oracle():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 128, 3).astype(np.float32) + 2.0  # away from origin
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    want = fps_oracle(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_skips_near_origin_points():
    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 64, 3).astype(np.float32) + 3.0
    xyz[0, 10:20] = 0.0  # zero padding: mag <= 1e-3, must never be sampled
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
    want = fps_oracle(xyz, 32)
    np.testing.assert_array_equal(got, want)
    assert not np.isin(got, np.arange(10, 20)).any()


def test_fps_spread():
    # FPS should cover the cloud better than the first-m prefix.
    rng = np.random.RandomState(2)
    xyz = rng.rand(1, 512, 3).astype(np.float32) + 1.0
    inds = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))[0]
    picked = xyz[0, inds]
    # nearest-sample distance for every point
    d = np.sqrt(((xyz[0][:, None] - picked[None]) ** 2).sum(-1)).min(1)
    prefix = xyz[0, :32]
    d_prefix = np.sqrt(((xyz[0][:, None] - prefix[None]) ** 2).sum(-1)).min(1)
    assert d.max() < d_prefix.max()


@pytest.mark.parametrize("chunk_size", [32, 1024])
def test_ball_query_matches_oracle(chunk_size):
    rng = np.random.RandomState(3)
    xyz = rng.rand(2, 200, 3).astype(np.float32)
    new_xyz = xyz[:, :40]
    got = np.asarray(
        ball_query(0.25, 8, jnp.asarray(xyz), jnp.asarray(new_xyz),
                   chunk_size=chunk_size)
    )
    want = ball_query_oracle(0.25, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_rows_are_zero():
    xyz = np.zeros((1, 16, 3), np.float32)
    new_xyz = np.full((1, 4, 3), 100.0, np.float32)  # far from all points
    got = np.asarray(ball_query(0.2, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    np.testing.assert_array_equal(got, np.zeros((1, 4, 4), np.int32))


def test_gather_and_group_points():
    rng = np.random.RandomState(4)
    pts = rng.randn(2, 30, 5).astype(np.float32)
    idx = rng.randint(0, 30, (2, 7)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)

    gidx = rng.randint(0, 30, (2, 7, 3)).astype(np.int32)
    got2 = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    want2 = np.stack([pts[b][gidx[b]] for b in range(2)])
    np.testing.assert_allclose(got2, want2)


def test_gather_points_grad_is_scatter_add():
    pts = jnp.ones((1, 5, 2))
    idx = jnp.asarray([[1, 1, 3]], dtype=jnp.int32)

    def f(p):
        return gather_points(p, idx).sum()

    g = np.asarray(jax.grad(f)(pts))[0, :, 0]
    np.testing.assert_allclose(g, [0.0, 2.0, 0.0, 1.0, 0.0])


def test_three_nn_matches_oracle():
    rng = np.random.RandomState(5)
    unknown = rng.randn(2, 50, 3).astype(np.float32)
    known = rng.randn(2, 20, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    wdist, widx = three_nn_oracle(unknown, known)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-5, atol=1e-6)


def test_three_interpolate_matches_manual():
    rng = np.random.RandomState(6)
    feats = rng.randn(2, 20, 8).astype(np.float32)
    idx = rng.randint(0, 20, (2, 50, 3)).astype(np.int32)
    w = rng.rand(2, 50, 3).astype(np.float32)
    got = np.asarray(
        three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    )
    want = np.einsum("bnt,bntc->bnc", w, np.stack(
        [feats[b][idx[b]] for b in range(2)]
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_three_interpolate_grad_matches_finite_diff():
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(1, 6, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 6, (1, 9, 3)).astype(np.int32))
    w = jnp.asarray(rng.rand(1, 9, 3).astype(np.float32))

    def f(x, ww):
        return (three_interpolate(x, idx, ww) ** 2).sum()

    gf, gw = jax.grad(f, argnums=(0, 1))(feats, w)
    eps = 1e-3
    # spot-check one coordinate of each grad by central differences
    for arr, g, coord in [(feats, gf, (0, 2, 1)), (w, gw, (0, 4, 2))]:
        pert = np.zeros(arr.shape, np.float32)
        pert[coord] = eps
        if arr is feats:
            fp = f(arr + pert, w)
            fm = f(arr - pert, w)
        else:
            fp = f(feats, arr + pert)
            fm = f(feats, arr - pert)
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[coord]), fd, rtol=1e-2)


def test_fps_pallas_matches_xla_interpret():
    """Pallas FPS kernel (interpret mode on CPU) vs the XLA reference."""
    import numpy as np
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pallas_fps import furthest_point_sample_pallas
    from butd_detr_tpu.ops.pointcloud import furthest_point_sample_xla

    rng = np.random.RandomState(11)
    xyz = (rng.rand(3, 257, 3) * 4 + 1).astype(np.float32)
    xyz[0, 5:9] = 0.0  # mag<=1e-3 skip path
    want = np.asarray(furthest_point_sample_xla(jnp.asarray(xyz), 48))
    got = np.asarray(
        furthest_point_sample_pallas(jnp.asarray(xyz), 48, interpret=True)
    )
    np.testing.assert_array_equal(want, got)


def test_hilbert3_is_a_true_hilbert_curve():
    """On the full 8^3 grid the code must be bijective with every pair of
    consecutive cells face-adjacent (L1 distance exactly 1)."""
    import numpy as np
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pointcloud import _hilbert3

    g = np.stack(
        np.meshgrid(*[np.arange(8)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    xyz = (g.astype(np.float32) + 0.5) / 8.0
    lo = np.zeros((1, 1, 3), np.float32)
    hi = np.ones((1, 1, 3), np.float32)
    code = np.asarray(
        _hilbert3(jnp.asarray(xyz[None]), jnp.asarray(lo), jnp.asarray(hi),
                  bits=3)
    )[0]
    assert len(np.unique(code)) == 512
    path = g[np.argsort(code)]
    steps = np.abs(np.diff(path, axis=0)).sum(1)
    assert (steps == 1).all()


def _clustered_scene(rng, n, b):
    pts = []
    for _ in range(40):
        c = rng.uniform(0, 4, 3)
        pts.append(c + rng.normal(0, 0.15, (n // 40, 3)))
    xyz = np.concatenate(pts)[None].repeat(b, 0).astype(np.float32)
    for i in range(b):
        rng.shuffle(xyz[i])  # the reference subsample randomizes order
    return xyz


def test_ball_query_pruned_exact():
    """The Hilbert-pruned path must match the direct sweep bit-exactly on
    clustered (fast path), random (fallback path), and empty-center data,
    including the original-center-order restore."""
    import numpy as np
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pointcloud import (
        _ball_query_pruned,
        _ball_query_scan,
        ball_query,
    )

    rng = np.random.default_rng(17)
    # small n keeps the interpret/XLA sweeps fast; the selection edge
    # cases (chunk overflow, empty centers, order restore) are n-independent
    B, n, m = 2, 2000, 128

    def check(xyz, cen, r, ns, mt=16, kc=96):
        ref, _ = _ball_query_scan(r, ns, jnp.asarray(xyz), jnp.asarray(cen))
        got = _ball_query_pruned(
            r, ns, jnp.asarray(xyz), jnp.asarray(cen), 256, mt, kc
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    xyz = _clustered_scene(rng, n, B)
    ci = rng.integers(0, xyz.shape[1], (B, m))
    cen = np.take_along_axis(xyz, ci[..., None], 1)
    check(xyz, cen, 0.2, 64)          # fast path
    check(xyz, cen, 0.4, 32)          # different radius/nsample
    check(xyz, cen, 0.2, 64, kc=4)    # forced fallback (count_rel > kc)

    far = cen.copy()
    far[:, ::3] += 50.0               # centers with no neighbors
    check(xyz, far, 0.2, 64)

    rand = rng.uniform(0, 4, (B, n, 3)).astype(np.float32)
    rcen = np.take_along_axis(
        rand, rng.integers(0, n, (B, m))[..., None], 1
    )
    check(rand, rcen, 0.2, 64)        # incoherent data

    # dispatcher engages pruning above the threshold
    got = ball_query(
        0.2, 64, jnp.asarray(xyz), jnp.asarray(cen), prune_threshold=4000
    )
    ref, _ = _ball_query_scan(0.2, 64, jnp.asarray(xyz), jnp.asarray(cen))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_pallas_multi_tile_batches():
    """Batch tiling (grid over batch) must not change results; exercise
    uneven tiles with padding."""
    import numpy as np
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pallas_fps import furthest_point_sample_pallas
    from butd_detr_tpu.ops.pointcloud import furthest_point_sample_xla

    rng = np.random.RandomState(5)
    xyz = (rng.rand(9, 300, 3) * 4 + 1).astype(np.float32)
    want = np.asarray(furthest_point_sample_xla(jnp.asarray(xyz), 64))
    for bt in (2, 4, 9):
        got = np.asarray(furthest_point_sample_pallas(
            jnp.asarray(xyz), 64, interpret=True, batch_tile=bt))
        np.testing.assert_array_equal(want, got, err_msg=f"tile {bt}")


def test_ball_query_pallas_pruned_exact():
    """The Pallas selection kernel (interpret mode) must match the direct
    sweep bit-exactly through the full pruned pipeline: clustered scenes,
    uniform-random scenes, empty centers, and the forced fallback."""
    import numpy as np
    import jax.numpy as jnp

    from butd_detr_tpu.ops.pointcloud import (
        _ball_query_pruned_pallas,
        _ball_query_scan,
    )

    rng = np.random.default_rng(23)
    B, n, m = 2, 1600, 128

    def check(xyz, cen, r, ns, kc=64):
        ref, _ = _ball_query_scan(r, ns, jnp.asarray(xyz), jnp.asarray(cen))
        got = _ball_query_pruned_pallas(
            r, ns, jnp.asarray(xyz), jnp.asarray(cen),
            k_chunks=kc, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    xyz = _clustered_scene(rng, n, B)
    ci = rng.integers(0, xyz.shape[1], (B, m))
    cen = np.take_along_axis(xyz, ci[..., None], 1)
    check(xyz, cen, 0.2, 64)
    check(xyz, cen, 0.4, 32)
    check(xyz, cen, 0.2, 64, kc=2)   # forced fallback
    far = cen.copy()
    far[:, ::3] += 50.0
    check(xyz, far, 0.2, 64)
    rand = rng.uniform(0, 4, (B, n, 3)).astype(np.float32)
    rc = np.take_along_axis(rand, rng.integers(0, n, (B, m))[..., None], 1)
    check(rand, rc, 0.2, 64)


def test_fused_attention_matches_reference():
    """Pallas fused attention (interpret mode): forward and all grads vs
    the unfused reference math, incl. torch-min key-padding masking."""
    import jax

    from butd_detr_tpu.ops.pallas_attention import fused_attention

    rng = np.random.RandomState(0)
    B, H, Lq, Lk, Dh = 2, 4, 40, 70, 36
    q = jnp.asarray(rng.randn(B, H, Lq, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, Dh).astype(np.float32))
    pad = np.zeros((B, Lk), bool)
    pad[:, 60:] = True
    padj = jnp.asarray(pad)
    scale = 1.0 / np.sqrt(Dh)

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        s = jnp.where(padj[:, None, None, :], jnp.finfo(jnp.float32).min, s)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    want = ref(q, k, v)
    # precise=True: f32/HIGHEST — matches the unfused math to fp noise
    got = fused_attention(q, k, v, padj, sm_scale=scale, interpret=True,
                          precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)

    gr = jax.grad(lambda a: jnp.sum(ref(*a) ** 2))((q, k, v))
    gg = jax.grad(lambda a: jnp.sum(fused_attention(
        a[0], a[1], a[2], padj, sm_scale=scale, interpret=True,
        precise=True) ** 2))((q, k, v))
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    # default (bf16 single-pass, f32 accum/softmax): same math to bf16
    # input-rounding tolerance — the production train-path precision
    # (comparable to the TF32 matmuls the reference trained with)
    got16 = fused_attention(q, k, v, padj, sm_scale=scale, interpret=True,
                            precise=False)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                               atol=0.04, rtol=0.02)
    gg16 = jax.grad(lambda a: jnp.sum(fused_attention(
        a[0], a[1], a[2], padj, sm_scale=scale, interpret=True,
        precise=False) ** 2))((q, k, v))
    for a, b in zip(gr, gg16):
        err = np.abs(np.asarray(b) - np.asarray(a))
        denom = np.abs(np.asarray(a)).max() + 1e-6
        assert (err / denom).max() < 0.05, (err / denom).max()


def test_scatter_rows_add_xla_matches_loop():
    from butd_detr_tpu.ops.pallas_scatter import scatter_rows_add_xla

    rng = np.random.RandomState(11)
    B, M, C, n = 2, 40, 5, 16
    g = rng.randn(B, M, C).astype(np.float32)
    idx = rng.randint(0, n, (B, M)).astype(np.int32)
    idx[0, :3] = n  # out-of-range pad entries are dropped
    want = np.zeros((B, n, C), np.float32)
    for b in range(B):
        for m in range(M):
            if idx[b, m] < n:
                want[b, idx[b, m]] += g[b, m]
    got = np.asarray(scatter_rows_add_xla(jnp.asarray(g), jnp.asarray(idx), n))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_scatter_rows_add_pallas_interpret_matches_xla():
    from butd_detr_tpu.ops.pallas_scatter import (
        scatter_rows_add_pallas,
        scatter_rows_add_xla,
    )

    rng = np.random.RandomState(12)
    B, M, C, n = 2, 300, 9, 130  # exercises M/C/N padding + chunking
    g = rng.randn(B, M, C).astype(np.float32)
    idx = rng.randint(0, n, (B, M)).astype(np.int32)
    want = scatter_rows_add_xla(jnp.asarray(g), jnp.asarray(idx), n)
    got = scatter_rows_add_pallas(jnp.asarray(g), jnp.asarray(idx), n, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_group_points_custom_vjp_matches_autodiff():
    # the custom VJP (ops/pallas_scatter.py one-hot matmul on TPU,
    # .at[].add off-TPU) must agree with plain take_along_axis autodiff
    rng = np.random.RandomState(13)
    B, N, C, m, ns = 2, 64, 5, 10, 4
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, m, ns)).astype(np.int32))
    ct = jnp.asarray(rng.randn(B, m, ns, C).astype(np.float32))

    _, vjp1 = jax.vjp(lambda p: group_points(p, idx), pts)
    _, vjp2 = jax.vjp(
        lambda p: jnp.take_along_axis(
            p, idx.reshape(B, m * ns, 1), axis=1
        ).reshape(B, m, ns, C),
        pts,
    )
    (g1,) = vjp1(ct)
    (g2,) = vjp2(ct)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_gather_points_custom_vjp_matches_autodiff():
    from butd_detr_tpu.ops.pointcloud import gather_points

    rng = np.random.RandomState(14)
    B, N, C, m = 2, 48, 7, 12
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, m)).astype(np.int32))
    ct = jnp.asarray(rng.randn(B, m, C).astype(np.float32))

    _, vjp1 = jax.vjp(lambda p: gather_points(p, idx), pts)
    _, vjp2 = jax.vjp(
        lambda p: jnp.take_along_axis(p, idx[..., None], axis=1), pts
    )
    (g1,) = vjp1(ct)
    (g2,) = vjp2(ct)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_gather_rows_pallas_interpret_bit_exact():
    """One-hot MXU row gather == take_along_axis BIT-exactly (each one-hot
    row selects exactly one source row; 1.0 * x is exact at HIGHEST)."""
    from butd_detr_tpu.ops.pallas_scatter import gather_rows_pallas

    rng = np.random.RandomState(21)
    B, N, C, M = 2, 300, 9, 517  # exercises N/C/M padding + chunking
    src = rng.randn(B, N, C).astype(np.float32)
    idx = rng.randint(0, N, (B, M)).astype(np.int32)
    want = np.take_along_axis(src, idx[..., None], axis=1)
    got = np.asarray(
        gather_rows_pallas(jnp.asarray(src), jnp.asarray(idx), True)
    )
    np.testing.assert_array_equal(got, want)
    # duplicate-heavy indices (ball-query pad-with-first pattern)
    idx2 = np.repeat(idx[:, :8], 65, axis=1)[:, :M].astype(np.int32)
    want2 = np.take_along_axis(src, idx2[..., None], axis=1)
    got2 = np.asarray(
        gather_rows_pallas(jnp.asarray(src), jnp.asarray(idx2), True)
    )
    np.testing.assert_array_equal(got2, want2)


def test_onehot_gather_bit_exact():
    """_onehot_gather (pointcloud.py) == take_along_axis BIT-exactly.

    The 3-pass bf16 decomposition is exact ONLY with the
    optimization_barriers in place: on TPU, XLA's algebraic simplifier
    rewrites the residual pattern `t - f32(bf16(t))` inexactly and can
    refactor the three one-hot matmuls into one bf16-summed operand,
    collapsing outputs to bf16(value). Verified on real TPU hardware;
    this CPU run pins the code path and the contract.
    """
    from butd_detr_tpu.ops.pointcloud import _onehot_gather

    rng = np.random.RandomState(7)
    B, nc, C, M = 2, 392, 128, 700
    table = (rng.randn(B, nc, C) * 1.5).astype(np.float32)
    table[:, -1] = 1e9  # Hilbert-pad sentinel chunk
    ids = rng.randint(0, nc, (B, M)).astype(np.int32)
    got = np.asarray(
        jax.jit(lambda i, t: _onehot_gather(i, t, nc))(
            jnp.asarray(ids), jnp.asarray(table)
        )
    )
    want = np.take_along_axis(table, ids[..., None], axis=1)
    np.testing.assert_array_equal(got, want)


def test_scatter_gather_pallas_bf16_single_pass():
    """bf16 payloads route through the 1-pass MXU path: the scatter
    accumulates exactly in f32; the gather is a bit-exact bf16 row copy."""
    from butd_detr_tpu.ops.pallas_scatter import (
        gather_rows_pallas,
        scatter_rows_add_pallas,
        scatter_rows_add_xla,
    )

    rng = np.random.RandomState(9)
    B, M, N, C = 2, 300, 96, 19
    g = rng.randn(B, M, C).astype(np.float32)
    gb = jnp.asarray(g).astype(jnp.bfloat16)
    idx = rng.randint(0, N + 4, (B, M)).astype(np.int32)  # some pad rows
    got = np.asarray(scatter_rows_add_pallas(gb, jnp.asarray(idx), N, True))
    want = np.asarray(
        scatter_rows_add_xla(gb.astype(jnp.float32), jnp.asarray(idx), N)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    gi = rng.randint(0, N, (B, 77)).astype(np.int32)
    out = gather_rows_pallas(src, jnp.asarray(gi), True)
    assert out.dtype == jnp.bfloat16
    want_g = np.take_along_axis(
        np.asarray(src.astype(jnp.float32)), gi[..., None], axis=1
    )
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)), want_g)


def test_ball_query_presorted_skips_sorts_and_stays_exact():
    """presorted=True (host Hilbert order, data/scan.py): bit-identical
    to the direct sweep on actually-sorted data, AND still exact when the
    claim is false (loose chunk AABBs at worst trip the full-sweep
    fallback)."""
    import jax.numpy as jnp

    from butd_detr_tpu.data.scan import hilbert_code
    from butd_detr_tpu.ops.pointcloud import (
        _ball_query_pruned_pallas,
        _ball_query_scan,
    )

    rng = np.random.default_rng(7)
    B, n, m = 2, 1600, 128
    xyz = _clustered_scene(rng, n, B)
    srt = np.stack(
        [s[np.argsort(hilbert_code(s), kind="stable")] for s in xyz]
    )
    ci = rng.integers(0, n, (B, m))
    cen = np.take_along_axis(srt, ci[..., None], 1)

    for r, ns in ((0.2, 64), (0.4, 32)):
        ref, _ = _ball_query_scan(r, ns, jnp.asarray(srt), jnp.asarray(cen))
        got = _ball_query_pruned_pallas(
            r, ns, jnp.asarray(srt), jnp.asarray(cen),
            k_chunks=64, interpret=True, presorted=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # false claim: unsorted input + presorted=True — still exact
    ref, _ = _ball_query_scan(0.2, 64, jnp.asarray(xyz), jnp.asarray(cen))
    got = _ball_query_pruned_pallas(
        0.2, 64, jnp.asarray(xyz), jnp.asarray(cen),
        k_chunks=64, interpret=True, presorted=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_host_hilbert_code_matches_device_curve_locality():
    """The numpy hilbert_code orders points so consecutive rows are
    spatial neighbors: mean consecutive distance shrinks vs random order
    by >4x, and the code is a valid Hilbert visit (device _hilbert3 on
    the same quantization agrees exactly)."""
    import jax.numpy as jnp

    from butd_detr_tpu.data.scan import hilbert_code
    from butd_detr_tpu.ops.pointcloud import _hilbert3

    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, 4, (5000, 3)).astype(np.float32)
    code_np = hilbert_code(xyz)
    lo = xyz.min(0, keepdims=True)[None]
    hi = xyz.max(0, keepdims=True)[None]
    code_dev = np.asarray(
        _hilbert3(jnp.asarray(xyz[None]), jnp.asarray(lo), jnp.asarray(hi))
    )[0]
    np.testing.assert_array_equal(code_np, code_dev)

    srt = xyz[np.argsort(code_np, kind="stable")]
    d_sorted = np.linalg.norm(np.diff(srt, axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(xyz, axis=0), axis=1).mean()
    assert d_sorted * 4 < d_rand
