"""Point-cloud primitives, TPU-native (pure XLA; Pallas variants in ops/pallas).

These replace the reference's CUDA extension (the only native code in
nickgkan/butd_detr): `pointnet2/_ext_src/src/*.cu` exposed through
`pointnet2/pointnet2_utils.py`. Semantics are replicated exactly (including
quirks) so that results are comparable; see each docstring for the cite.

Conventions differ deliberately from the reference: all features are
channels-LAST `(B, N, C)` — the natural TPU layout (C on the 128-lane axis)
— whereas torch Conv1d forced `(B, C, N)` upstream. Gather/group/interpolate
are expressed as `take_along_axis`/einsum, so their scatter-add gradients
(reference: `atomicAdd` in e.g. `sampling_gpu.cu:39-52`) come from JAX
autodiff for free.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "furthest_point_sample",
    "gather_points",
    "ball_query",
    "group_points",
    "three_nn",
    "three_interpolate",
]


def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative furthest-point sampling. On TPU dispatches to the Pallas
    kernel (ops/pallas_fps.py — same semantics, ~100x faster compile);
    elsewhere uses the pure-XLA loop below."""
    if jax.default_backend() == "tpu":
        from butd_detr_tpu.ops.pallas_fps import furthest_point_sample_pallas

        return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample_xla(xyz, npoint)


@partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative furthest-point sampling (pure XLA).

    Replicates `furthest_point_sampling_kernel`
    (reference pointnet2/_ext_src/src/sampling_gpu.cu:74-178):
      * index 0 is always selected first;
      * the running min-distance buffer starts at 1e10 (sampling.cpp:79);
      * points with squared magnitude <= 1e-3 are never candidates
        (sampling_gpu.cu:105-106) — ScanNet scenes are axis-aligned away
        from the origin, so this skips zero-padding;
      * each step picks the argmax of min-distance-to-selected-set
        (first occurrence on ties).

    Args:
        xyz: (B, N, 3) float point coordinates.
        npoint: number of samples m.

    Returns:
        (B, m) int32 indices into N. Non-differentiable
        (reference pointnet2/pointnet2_utils.py:72-77).
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    valid = jnp.sum(xyz * xyz, axis=-1) > 1e-3  # (B, N)

    temp0 = jnp.full((B, N), 1e10, jnp.float32)
    idxs0 = jnp.zeros((B, npoint), jnp.int32)
    old0 = jnp.zeros((B,), jnp.int32)

    def body(j, state):
        temp, idxs, old = state
        last = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - last) ** 2, axis=-1)  # (B, N)
        d2 = jnp.minimum(d, temp)
        temp = jnp.where(valid, d2, temp)
        # Invalid points get score -1 (CUDA init `best = -1`), so they are
        # only picked if no point is valid (then argmax returns 0 = besti init).
        best = jnp.argmax(jnp.where(valid, d2, -1.0), axis=1).astype(jnp.int32)
        idxs = lax.dynamic_update_index_in_dim(idxs, best, j, axis=1)
        return temp, idxs, best

    _, idxs, _ = lax.fori_loop(1, npoint, body, (temp0, idxs0, old0))
    return lax.stop_gradient(idxs)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather point features by index: out[b, j] = points[b, idx[b, j]].

    Channels-last analogue of `gather_points_kernel`
    (reference sampling_gpu.cu:13-25). The scatter-add gradient
    (sampling_gpu.cu:39-52) is provided by autodiff.

    Args:
        points: (B, N, C).
        idx: (B, M) int32.

    Returns:
        (B, M, C).
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("chunk_size",))
def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    chunk_size: int = 256,
) -> jax.Array:
    """Fixed-radius neighbor search with first-k-in-index-order semantics.

    Replicates `query_ball_point_kernel`
    (reference pointnet2/_ext_src/src/ball_query_gpu.cu:14-49):
      * scans candidate points in index order, keeping the first `nsample`
        with squared distance < radius^2;
      * on the first hit, all slots are pre-filled with that index, so
        under-full rows are padded with the first neighbor;
      * rows with no hit stay 0 (output is zero-initialized,
        ball_query.cpp:25).

    TPU design: "the first `nsample` in-radius indices in index order" are
    exactly the `nsample` largest values of score = -k over hit points
    (sorted descending = ascending index). So the (m, N) candidate sweep is
    a streaming top-k: a `lax.scan` over N-chunks whose carry is the running
    best-`nsample` scores per center, merged with each chunk's `lax.top_k`.
    No scatters, no data-dependent control flow; the whole thing is
    elementwise math + top-k, which XLA maps well onto the VPU.

    Args:
        radius: ball radius.
        nsample: max neighbors per center.
        xyz: (B, N, 3) candidate points.
        new_xyz: (B, m, 3) query centers.

    Returns:
        (B, m, nsample) int32 indices into N. Non-differentiable.
    """
    B, N, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    r2 = jnp.float32(radius * radius)
    NO_HIT = jnp.int32(-(2**30))  # score for misses; any hit beats it

    pad = (-N) % chunk_size
    if pad:
        # Sentinel points far away: never inside any ball.
        xyz = jnp.concatenate(
            [xyz, jnp.full((B, pad, 3), 1e9, jnp.float32)], axis=1
        )
    num_chunks = (N + pad) // chunk_size
    # (num_chunks, B, chunk, 3) so scan iterates over chunks.
    xyz_chunks = xyz.reshape(B, num_chunks, chunk_size, 3).transpose(1, 0, 2, 3)
    local_k = jnp.arange(chunk_size, dtype=jnp.int32)

    def step(best, inp):
        # best: (B, m, nsample) int32 — top scores so far (score = -index).
        chunk_i, xyz_c = inp
        # Exact per-coordinate distances (matches CUDA accumulation order).
        d2 = (
            (new_xyz[:, :, None, 0] - xyz_c[:, None, :, 0]) ** 2
            + (new_xyz[:, :, None, 1] - xyz_c[:, None, :, 1]) ** 2
            + (new_xyz[:, :, None, 2] - xyz_c[:, None, :, 2]) ** 2
        )  # (B, m, chunk)
        kglob = chunk_i * chunk_size + local_k  # (chunk,)
        score = jnp.where(d2 < r2, -kglob[None, None, :], NO_HIT)
        if chunk_size > nsample:
            score, _ = lax.top_k(score, nsample)
        merged = jnp.concatenate([best, score], axis=-1)
        best, _ = lax.top_k(merged, nsample)
        return best, None

    best0 = jnp.full((B, m, nsample), NO_HIT, jnp.int32)
    best, _ = lax.scan(
        step, best0, (jnp.arange(num_chunks, dtype=jnp.int32), xyz_chunks)
    )

    hit = best > NO_HIT  # slots actually filled, in index order
    idx = jnp.where(hit, -best, 0)
    # Pad-with-first: unfilled slots take the first neighbor (slot 0);
    # rows with no hit at all stay 0 (output zero-init, ball_query.cpp:25).
    idx = jnp.where(hit, idx, idx[:, :, :1])
    return lax.stop_gradient(idx)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Group point features: out[b, j, k] = points[b, idx[b, j, k]].

    Channels-last analogue of `group_points_kernel`
    (reference group_points_gpu.cu:13-29); scatter-add gradient via autodiff.

    Args:
        points: (B, N, C).
        idx: (B, m, nsample) int32.

    Returns:
        (B, m, nsample, C).
    """
    B, N, C = points.shape
    _, m, ns = idx.shape
    flat = jnp.take_along_axis(
        points, idx.reshape(B, m * ns, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(B, m, ns, C)


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array):
    """Three nearest neighbors by brute force.

    Replicates `three_nn_kernel` (reference interpolate_gpu.cu:14-73) +
    the sqrt applied by the wrapper (pointnet2/pointnet2_utils.py:139-141):
    returns *l2 distances* (not squared) and indices.

    Args:
        unknown: (B, n, 3) query points.
        known: (B, m, 3) support points.

    Returns:
        dist: (B, n, 3) float32 distances to the 3 nearest known points.
        idx: (B, n, 3) int32 indices. Non-differentiable.
    """
    unknown = unknown.astype(jnp.float32)
    known = known.astype(jnp.float32)
    d2 = (
        (unknown[:, :, None, 0] - known[:, None, :, 0]) ** 2
        + (unknown[:, :, None, 1] - known[:, None, :, 1]) ** 2
        + (unknown[:, :, None, 2] - known[:, None, :, 2]) ** 2
    )  # (B, n, m)
    neg_top, idx = lax.top_k(-d2, 3)  # stable: ties -> lower index first
    dist = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    return lax.stop_gradient(dist), lax.stop_gradient(idx.astype(jnp.int32))


def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """Weighted interpolation of 3 neighbor features.

    Channels-last analogue of `three_interpolate_kernel`
    (reference interpolate_gpu.cu:77-99):
    out[b, j] = sum_t weight[b, j, t] * features[b, idx[b, j, t]].
    Gradients w.r.t. `features` (scatter-add, interpolate_gpu.cu:116-134)
    and `weight` come from autodiff.

    Args:
        features: (B, m, C).
        idx: (B, n, 3) int32.
        weight: (B, n, 3).

    Returns:
        (B, n, C).
    """
    gathered = group_points(features, idx)  # (B, n, 3, C)
    return jnp.einsum(
        "bnt,bntc->bnc", weight.astype(gathered.dtype), gathered
    )
