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

Kernel layout (v2). Coordinates live as ONE (3*BB, R, 128) block — rows
[0:BB] = x, [BB:2BB] = y, [2BB:3BB] = z — so the per-step coordinate
extraction of the newly selected point is a single masked select + one
two-stage reduction over all three coordinates at once (the v1 layout with
separate x/y/z planes needed three, i.e. 10 reductions/step vs 6 now; the
sequential loop is reduction-latency-bound). The validity mask
(mag^2 <= 1e-3 skip, sampling_gpu.cu:105-106) is folded into the running
min-distance buffer by initializing invalid lanes to -1: `min(temp, d)`
keeps them at -1 forever since d >= 0, which removes the per-step
`where(valid, ...)` pass AND the separate score pass.

Semantics replicate the reference CUDA kernel exactly
(pointnet2/_ext_src/src/sampling_gpu.cu:74-178), like the XLA path:
index 0 first, 1e10 init, mag^2 <= 1e-3 skip, argmax ties -> first
occurrence, distance accumulated per coordinate as (dx^2 + dy^2) + dz^2.
Points are laid out (R, 128); row-major flattening preserves global
indices because the wrapper pads N to a multiple of 128 with zeros
(zero magnitude => never candidates).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

LANES = 128


def _batch_tile(B: int, R: int) -> int:
    """Batch tile: largest fit under the VMEM budget, then BALANCED over
    the resulting grid.

    Per batch row the kernel keeps 5 R-row f32 lane-tiles PERSISTENT
    (xyz3 = 3 rows, temp, flat); the loop transients (diff/sq, tree
    temporaries) are buffer-reused by Mosaic and covered by budgeting the
    persistent set against 13 MB of the 16 MB cap (hardware-validated at
    B=24, N=50k — see PERF.md). Given the max fit, the tile is shrunk to
    balance the grid: the programs serialize, so wall time is
    n_programs x slowest tile — at B=24, R=391 (fit 13) the balanced
    12+12 grid measures 30.8 ms vs 33.0 ms for 13+11. Small tiers
    (N <= 2048) fit the whole batch in one program.
    """
    per_row = 5 * R * LANES * 4
    fit = max(1, min((13 * 2**20) // per_row, 64))
    if fit >= B:
        return B
    n_programs = -(-B // fit)  # ceil
    return -(-B // n_programs)  # balanced tile, same program count


def _fps_kernel(npoint: int, xyz3_ref, out_ref):
    # xyz3_ref: (3*BB, R, 128) f32 — x rows, then y rows, then z rows.
    xyz3 = xyz3_ref[:]
    BB3, R, _ = xyz3.shape
    BB = BB3 // 3
    x = xyz3[0:BB]
    y = xyz3[BB : 2 * BB]
    z = xyz3[2 * BB : 3 * BB]

    rows = lax.broadcasted_iota(jnp.int32, (BB, R, LANES), 1)
    cols = lax.broadcasted_iota(jnp.int32, (BB, R, LANES), 2)
    flat = rows * LANES + cols  # global point index per lane
    out_cols = lax.broadcasted_iota(jnp.int32, (BB, 1, npoint), 2)

    BIG = jnp.int32(2**30)

    def _reduce(op, a):
        # (BB', R, L) -> (BB', 1, 1): explicit binary TREE over the R axis
        # at full lane width (log2(R) dependent stages, each halving the
        # array; total extra elementwork ~2x one pass), then the native
        # lane reduction on the tiny (BB', 1, L) remainder. The sequential
        # selection loop is bound by reduction LATENCY, and the native
        # axis-1 reduction is a linear accumulation over R rows.
        # (multi-axis reduce SIGABRTs Mosaic; lane-axis-only is fast.)
        pair = {jnp.max: jnp.maximum, jnp.min: jnp.minimum,
                jnp.sum: jnp.add}[op]
        r = a.shape[1]
        while r > 1:
            h = r // 2
            head = pair(a[:, :h], a[:, h : 2 * h])
            a = (
                head if 2 * h == r
                else jnp.concatenate([head, a[:, 2 * h :]], axis=1)
            )
            r = a.shape[1]
        return op(a, axis=2, keepdims=True)

    def _extract_coords(mask):
        # Coordinates of the selected point per batch row: tile the (BB,R,L)
        # match mask across the stacked coordinate block — one masked select
        # + one two-stage sum-reduction covers all three coordinates.
        # (Tiling the mask, not the scalar index, keeps Mosaic layouts
        # happy: a reduction result is layout-replicated and broadcasts
        # against `flat` for free, whereas a concatenated (3BB,1,1) scalar
        # cannot broadcast across both sublanes and lanes.)
        mask3 = jnp.concatenate([mask, mask, mask], axis=0)  # (3BB, R, L)
        return _reduce(jnp.sum, jnp.where(mask3, xyz3, 0.0))  # (3BB,1,1)

    # Invalid points (mag^2 <= 1e-3) get temp = -1 once; min(temp, d) with
    # d >= 0 keeps them -1 forever, so temp doubles as the argmax score
    # (CUDA init `best = -1`): they are only picked if no point is valid
    # (then every lane ties at -1 and the min-index rule returns 0).
    valid0 = (x * x + y * y + z * z) > 1e-3
    temp0 = jnp.where(valid0, jnp.float32(1e10), jnp.float32(-1.0))
    c0 = _extract_coords(flat == 0)
    acc0 = jnp.zeros((BB, 1, npoint), jnp.int32)  # slot 0 = index 0

    def body(j, carry):
        c3, temp, acc = carry
        diff = xyz3 - c3
        sq = diff * diff
        # exact CUDA accumulation order: (dx^2 + dy^2) + dz^2
        d = (sq[0:BB] + sq[BB : 2 * BB]) + sq[2 * BB : 3 * BB]
        temp = jnp.minimum(temp, d)
        m = _reduce(jnp.max, temp)
        # first-occurrence argmax per batch row
        best = _reduce(jnp.min, jnp.where(temp == m, flat, BIG))
        acc = jnp.where(out_cols == j, best, acc)
        return _extract_coords(flat == best), temp, acc

    _, _, acc = lax.fori_loop(1, npoint, body, (c0, temp0, acc0))
    out_ref[:] = acc


@partial(jax.jit, static_argnums=(1,),
         static_argnames=("interpret", "batch_tile"))
def furthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, *, interpret: bool = False,
    batch_tile: int | None = None,
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

    BB = batch_tile or _batch_tile(B, R)
    bpad = (-B) % BB
    if bpad:
        xyz = jnp.pad(xyz, ((0, bpad), (0, 0), (0, 0)))
    n_tiles = (B + bpad) // BB
    # (n_tiles*3*BB, R, L): per batch-tile, x rows then y rows then z rows,
    # so one BlockSpec row-slice hands the kernel its (3*BB, R, L) block.
    planes = (
        xyz.reshape(n_tiles, BB, R, LANES, 3)
        .transpose(0, 4, 1, 2, 3)
        .reshape(n_tiles * 3 * BB, R, LANES)
    )

    out = pl.pallas_call(
        partial(_fps_kernel, npoint),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (3 * BB, R, LANES), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (BB, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B + bpad, 1, npoint), jnp.int32),
        interpret=interpret,
    )(planes)
    return lax.stop_gradient(out[:B, 0, :])


def furthest_point_sample_with_xyz_pallas(
    xyz: jax.Array, npoint: int, *, interpret: bool = False,
    batch_tile: int | None = None,
):
    """FPS returning (inds, new_xyz == gather_points(xyz, inds)).

    An in-kernel coords accumulator was tried and REJECTED (r2): the
    (3*BB, 1, npoint) carry pushed scoped VMEM past 16 MB at the
    production tile, and emitting coords measured ~7 ms slower than the
    plain XLA gather it replaced (~1.5 ms at B=24). A (val, idx)
    tournament-tree argmax was also tried and REJECTED: 34.5 ms vs the
    v2 two-reduction form's 33.0 at tile 13 (chained-K methodology).
    The fused API is kept so callers express the intent once and the
    implementation can evolve.
    """
    from butd_detr_tpu.ops.pointcloud import gather_points

    inds = furthest_point_sample_pallas(
        xyz, npoint, interpret=interpret, batch_tile=batch_tile
    )
    return inds, gather_points(xyz.astype(jnp.float32), inds)
