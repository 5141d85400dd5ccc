"""Pallas TPU kernel for furthest-point sampling.

FPS is the one genuinely sequential point op (SURVEY.md section 7 "hard
parts"): npoint (~2048) dependent steps, each needing a full pass over all
N (~50k) points. Two wins over the XLA `lax.fori_loop` version
(ops/pointcloud.py):

  * compile time: the carried while-loop takes XLA minutes to compile at
    production shape; this kernel compiles in ~2s;
  * throughput: the batch is processed INSIDE one program (vectorized over
    a B-tile, coordinates + running min-distance resident in VMEM), instead
    of a serial per-sample grid — each sequential step covers the whole
    tile in a few VPU passes.

Semantics replicate the reference CUDA kernel exactly
(pointnet2/_ext_src/src/sampling_gpu.cu:74-178), like the XLA path:
index 0 first, 1e10 init, mag^2 <= 1e-3 skip, argmax ties -> first
occurrence. Points are laid out (R, 128); row-major flattening preserves
global indices because the wrapper pads N to a multiple of 128 with zeros
(zero magnitude => never candidates).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

LANES = 128
MAX_BATCH_TILE = 8  # VMEM budget: 8 x 50k pts x (x,y,z,temp,d) ~ 10 MB


def _fps_kernel(npoint: int, x_ref, y_ref, z_ref, out_ref):
    x = x_ref[:]  # (BB, R, 128) f32
    y = y_ref[:]
    z = z_ref[:]
    valid = (x * x + y * y + z * z) > 1e-3

    BB, R, _ = x.shape
    rows = lax.broadcasted_iota(jnp.int32, (BB, R, LANES), 1)
    cols = lax.broadcasted_iota(jnp.int32, (BB, R, LANES), 2)
    flat = rows * LANES + cols  # global point index per lane
    out_cols = lax.broadcasted_iota(jnp.int32, (BB, 1, npoint), 2)

    BIG = jnp.int32(2**30)

    def _reduce(op, a):
        # (BB, R, L) -> (BB, 1, 1) via two single-axis reductions (lane
        # axis first; multi-axis reduce SIGABRTs Mosaic, sublane-first is
        # ~1.5x slower on v5e)
        return op(op(a, axis=2, keepdims=True), axis=1, keepdims=True)

    def select_one(j, sel, temp, acc):
        onehot = (flat == sel).astype(jnp.float32)
        lastx = _reduce(jnp.sum, x * onehot)
        lasty = _reduce(jnp.sum, y * onehot)
        lastz = _reduce(jnp.sum, z * onehot)
        d = (
            (x - lastx) * (x - lastx)
            + (y - lasty) * (y - lasty)
            + (z - lastz) * (z - lastz)
        )
        temp = jnp.where(valid, jnp.minimum(temp, d), temp)
        score = jnp.where(valid, temp, -1.0)
        # first-occurrence argmax per batch row
        m = _reduce(jnp.max, score)
        best = _reduce(jnp.min, jnp.where(score == m, flat, BIG))
        acc = jnp.where(out_cols == j, best, acc)
        return best, temp, acc

    # NOTE: manual unrolling (2x/4x) exceeds the 16M scoped-VMEM budget at
    # the production tile (8 x 50k); one selection per loop iteration.
    def body(j, carry):
        sel, temp, acc = carry
        return select_one(j, sel, temp, acc)

    sel0 = jnp.zeros((BB, 1, 1), jnp.int32)
    temp0 = jnp.full((BB, R, LANES), 1e10, jnp.float32)
    acc0 = jnp.zeros((BB, 1, npoint), jnp.int32)  # slot 0 = index 0
    _, _, acc = lax.fori_loop(1, npoint, body, (sel0, temp0, acc0))
    out_ref[:] = acc


@partial(jax.jit, static_argnums=(1,), static_argnames=("interpret",))
def furthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, *, interpret: bool = False
) -> jax.Array:
    """Drop-in Pallas replacement for ops.furthest_point_sample.

    Args:
        xyz: (B, N, 3) float coordinates.
        npoint: number of samples.
        interpret: run in interpreter mode (CPU testing).

    Returns:
        (B, npoint) int32 indices. Non-differentiable.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    pad = (-N) % LANES
    if pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))  # zeros: invalid
    R = (N + pad) // LANES

    BB = B if B <= MAX_BATCH_TILE else MAX_BATCH_TILE
    bpad = (-B) % BB
    if bpad:
        xyz = jnp.pad(xyz, ((0, bpad), (0, 0), (0, 0)))
    planes = xyz.reshape(B + bpad, R, LANES, 3)

    in_spec = pl.BlockSpec(
        (BB, R, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_fps_kernel, npoint),
        grid=((B + bpad) // BB,),
        in_specs=[in_spec, in_spec, in_spec],
        out_specs=pl.BlockSpec(
            (BB, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B + bpad, 1, npoint), jnp.int32),
        interpret=interpret,
    )(planes[..., 0], planes[..., 1], planes[..., 2])
    return lax.stop_gradient(out[:B, 0, :])
