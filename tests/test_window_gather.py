"""Windowed Pallas row gather vs take_along_axis oracle (bit-exact).

The production sa1 grouping gather (ops/pallas_window_gather.py) must
copy rows bit-exactly in both payload dtypes, engage its fast path on
spatially local index patterns (the Hilbert-ordered cloud the data
pipeline provides), and fall back — still exactly — on adversarial
index patterns that blow the per-tile touched-chunk budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from butd_detr_tpu.ops.pallas_window_gather import (
    KT,
    TC,
    windowed_group_points,
)


def _oracle(points, idx):
    B, m, ns = idx.shape
    flat = idx.reshape(B, m * ns)
    return jnp.take_along_axis(
        points, flat[..., None].astype(jnp.int32), axis=1
    ).reshape(B, m, ns, points.shape[-1])


def _local_idx(rng, B, N, m, ns, window=256):
    """Ball-query-like indices: each row's neighbors within a local
    window; rows in random order (the op sorts them itself)."""
    base = rng.randint(0, max(1, N - window), size=(B, m))
    off = rng.randint(0, window, size=(B, m, ns))
    return (base[..., None] + off).astype(np.int32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_windowed_gather_local_exact(dtype):
    rng = np.random.RandomState(0)
    B, N, C, m, ns = 2, 1000, 6, 128, 64
    pts = jnp.asarray(
        rng.randn(B, N, C).astype(np.float32) * 3.7
    ).astype(dtype)
    idx = jnp.asarray(_local_idx(rng, B, N, m, ns))
    out = windowed_group_points(pts, idx, interpret=True)
    ref = _oracle(pts, idx)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_windowed_gather_adversarial_fallback_exact():
    # uniform random ids blow the KT distinct-chunk budget -> lax.cond
    # fallback, still bit-exact
    rng = np.random.RandomState(1)
    B, N, C, m, ns = 2, 4096, 6, 64, 64
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, m, ns)).astype(np.int32))
    out = windowed_group_points(pts, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_oracle(pts, idx)))


def test_windowed_gather_pad_paths():
    # N not a multiple of 128; m not a multiple of the tile*program width
    rng = np.random.RandomState(2)
    B, N, C, m, ns = 1, 777, 5, 40, 16
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(_local_idx(rng, B, N, m, ns, window=100))
    out = windowed_group_points(pts, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_oracle(pts, idx)))


def test_windowed_gather_duplicate_and_zero_rows():
    # ball-query pad-with-first semantics: rows full of one repeated id,
    # and all-zero rows
    rng = np.random.RandomState(3)
    B, N, C, m, ns = 1, 512, 6, 64, 32
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = np.zeros((B, m, ns), np.int32)
    idx[:, ::2] = rng.randint(0, N, size=(B, m // 2, 1))  # repeated rows
    out = windowed_group_points(pts, jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_oracle(pts, jnp.asarray(idx))))


def test_production_shape_tile_budget_engages():
    """On Hilbert-local data at the sa1 shape the fast path must engage
    (the whole point); verify the violated flag stays false for
    ball-query-like windows and true for uniform indices."""
    from butd_detr_tpu.ops.pallas_window_gather import BIG  # noqa: F401

    rng = np.random.RandomState(4)
    B, N, m, ns = 1, 8192, 512, 64
    idx = jnp.asarray(_local_idx(rng, B, N, m, ns, window=256))
    # reproduce the prep's count: distinct chunks per tile of TC sorted rows
    lo = np.asarray(jnp.min(idx, axis=2))
    perm = np.argsort(lo, axis=1)
    idx_s = np.take_along_axis(np.asarray(idx), perm[..., None], axis=1)
    T = m // TC
    cids = (idx_s >> 7).reshape(B, T, TC * ns)
    counts = [
        len(np.unique(cids[b, t])) for b in range(B) for t in range(T)
    ]
    assert max(counts) <= KT, max(counts)


def test_windowed_gather_mid_tier_exact():
    # counts between KT_SMALL and KT: exercises the full-KT tier branch
    from butd_detr_tpu.ops.pallas_window_gather import KT_SMALL

    rng = np.random.RandomState(5)
    B, N, C, m, ns = 1, 8192, 6, 64, 64
    # wide windows -> ~20-28 distinct 128-chunks per 8-row tile
    idx = jnp.asarray(_local_idx(rng, B, N, m, ns, window=3300))
    lo = np.asarray(jnp.min(idx, axis=2))
    perm = np.argsort(lo, axis=1)
    idx_s = np.take_along_axis(np.asarray(idx), perm[..., None], axis=1)
    cids = (idx_s >> 7).reshape(B, m // TC, TC * ns)
    counts = [len(np.unique(cids[0, t])) for t in range(m // TC)]
    assert max(counts) > KT_SMALL and max(counts) <= KT, counts
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    out = windowed_group_points(pts, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(_oracle(pts, idx))
    )
