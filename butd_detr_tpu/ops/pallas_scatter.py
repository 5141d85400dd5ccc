"""Pallas TPU kernel: row scatter-add as on-the-fly one-hot MXU matmuls.

The VJP of the grouping gathers (`group_points` / `three_interpolate`,
reference group_points_gpu.cu:45-62 / interpolate_gpu.cu:116-134 — CUDA
atomicAdd) is a scatter-add. XLA lowers data-dependent scatter on TPU to a
serialized per-row loop, which makes the backward pass of the sa2-sa4 set
abstractions the dominant pole of the train step (PERF.md r2 decomposition:
~275 ms of a 515 ms step is backward, led by these scatters). This kernel
computes

    out[b, n, :] = sum_m [idx[b, m] == n] * g[b, m, :]

as a chunked matmul: per M-chunk, a (MC, N) one-hot tile is materialized in
VMEM (lane-iota compare — never touches HBM) and contracted with the (MC, C)
cotangent rows on the MXU, accumulating into the (N, C) output block. The
one-hot entries are exact in f32, so each output row is an exact sum of the
selected cotangent rows (summation order differs from XLA's scatter; values
agree to reassociation).

Precision: the one-hot operand is exact in bf16 (0/1), so instead of
`Precision.HIGHEST` (6 MXU passes: both operands split 3-way) only the
payload is split into bf16 components hi = bf16(v), mid = bf16(v - hi),
lo = bf16(v - hi - mid). hi+mid+lo == v exactly (each residual keeps <= 8
significant bits), products against 0/1 are exact, and the MXU accumulates
in f32 — the same per-component sums HIGHEST computes, in 3 passes (2x).

Shapes here are tiny by MXU standards (N<=2048, C<=384 after padding), so
FLOP cost is ~0.5 TFLOP at B=24 across sa2-sa4 — milliseconds, vs the
serialized scatter's ~100 ms.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _bf16_split3(v):
    """Exact 3-way bf16 decomposition of f32: hi + mid + lo == v.

    f32 carries 24 mantissa bits; each bf16 component captures the top 8
    of the remaining residual, so the third residual is exactly
    representable and the sum reconstructs v bit-exactly."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_dot(oh_bool, v, dim_numbers):
    """dot_general(one-hot, v) with exact results on the MXU.

    bf16 payloads need a single pass (the values are exact as-is and the
    products against 0/1 are exact, f32 accumulation); f32 payloads use
    the 3-pass hi/mid/lo decomposition (see module docstring)."""
    oh = oh_bool.astype(jnp.bfloat16)
    comps = (v,) if v.dtype == jnp.bfloat16 else _bf16_split3(v)
    acc = None
    for comp in comps:
        part = lax.dot_general(
            oh, comp, dimension_numbers=dim_numbers,
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc

# largest N for which the (N, C) accumulator + (MC, N) one-hot tile fit the
# ~16 MB scoped VMEM comfortably; callers fall back to XLA scatter above it
MAX_N = 4096
LANES = 128


def _make_kernel(N):
    from jax.experimental import pallas as pl

    def kernel(g_ref, idx_ref, out_ref):
        # zero the accumulator on the first M-chunk of this batch row
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        g = g_ref[0]  # (MC, C)
        idx = idx_ref[0]  # (MC, 1) i32
        MC = g.shape[0]
        # one-hot (MC, N): compare the index column against the absolute
        # lane index (lane-dim broadcast of a size-1 lane operand)
        cols = lax.broadcasted_iota(jnp.int32, (MC, N), 1)
        oh = idx == cols
        # (N, C) += (MC, N)^T @ (MC, C) — contract the chunk dim on the
        # MXU; bf16 cotangents take 1 pass, f32 take 3 exact passes
        out_ref[0] += _onehot_dot(oh, g, (((0,), (0,)), ((), ())))

    return kernel


def _pad_to(x, mult, axis, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnums=(2, 3))
def scatter_rows_add_pallas(g, idx, n, interpret=False):
    """out[b, j, :] = sum over m with idx[b, m] == j of g[b, m, :].

    g: (B, M, C) f32 or bf16 cotangent rows; idx: (B, M) int32 in [0, n)
    (entries >= n are ignored — used for M padding); returns (B, n, C)
    f32 (the accumulator dtype — callers cast back if they want bf16).
    bf16 cotangents run a single MXU pass per chunk instead of three.
    """
    from jax.experimental import pallas as pl

    B, M, C = g.shape
    N = -(-n // LANES) * LANES
    Cp = -(-C // LANES) * LANES
    # chunk size: one-hot tile (MC, N) f32 <= 2 MB. Mosaic double-buffers
    # the grid blocks, so the working set is ~2x (one-hot + g tile + out);
    # 2 MB keeps the sa2 shape (N=2048, Cp=256) at ~10 MB scoped VMEM
    MC = max(LANES, min(512, (2 * 2**20) // (N * 4) // LANES * LANES))
    if g.dtype not in (jnp.float32, jnp.bfloat16):
        g = g.astype(jnp.float32)
    g = _pad_to(_pad_to(g, Cp, 2), MC, 1)
    idx = _pad_to(idx.astype(jnp.int32), MC, 1, value=N)
    Mp = g.shape[1]
    # replicate idx over a lane so the kernel block is 2-D (MC, LANES)
    idxl = jnp.broadcast_to(idx[:, :, None], (B, Mp, 1))
    n_chunks = Mp // MC

    out = pl.pallas_call(
        _make_kernel(N),
        out_shape=jax.ShapeDtypeStruct((B, N, Cp), jnp.float32),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, MC, Cp), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, MC, 1), lambda b, c: (b, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, Cp), lambda b, c: (b, 0, 0)),
        interpret=interpret,
    )(g, idxl)
    return out[:, :n, :C]


def scatter_rows_add_xla(g, idx, n):
    """XLA fallback: the same scatter-add via .at[].add (autodiff's form)."""
    B, M, C = g.shape
    safe = jnp.minimum(idx, n - 1)
    keep = (idx < n)[..., None].astype(g.dtype)
    out = jnp.zeros((B, n, C), g.dtype)
    return out.at[
        jnp.arange(B)[:, None], safe
    ].add(g * keep)


def scatter_rows_add(g, idx, n):
    """Backend-dispatched row scatter-add; always accumulates and
    returns f32 (callers cast back to their cotangent dtype)."""
    if jax.default_backend() == "tpu" and n <= MAX_N:
        return scatter_rows_add_pallas(g, idx, n)
    return scatter_rows_add_xla(g.astype(jnp.float32), idx, n)


# ---------------------------------------------------------------------------
# Forward mirror: row GATHER as one-hot MXU matmuls.
#
# XLA's TPU row gather is per-row-cost dominated (PERF.md r1b: a chunked
# take_along_axis measured 187 ms where the one-hot matmul form is <1 ms).
# For the small-source layers (sa2-4 / FP: N <= 4096) the one-hot FLOPs
# are affordable, so the same (MC, N) lane-iota one-hot used by the
# scatter above computes out = oh @ src instead of oh^T @ g. At HIGHEST
# precision each output row is 1.0 * src_row + zeros — bit-exact.
# ---------------------------------------------------------------------------


def _make_gather_kernel(N):
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(src_ref, idx_ref, out_ref):
        src = src_ref[0]  # (N, C)
        idx = idx_ref[0]  # (MC, 1)
        MC = idx.shape[0]
        cols = lax.broadcasted_iota(jnp.int32, (MC, N), 1)
        oh = idx == cols
        # exact row copy: hi_j + mid_j + lo_j == src_j bit-exactly for
        # f32; bf16 rows copy in one pass (f32 accum -> bf16 is exact)
        out_ref[0] = _onehot_dot(
            oh, src, (((1,), (0,)), ((), ()))
        ).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnums=(2,))
def gather_rows_pallas(src, idx, interpret=False):
    """out[b, m, :] = src[b, idx[b, m], :] via one-hot MXU matmuls.

    src: (B, N, C) f32 or bf16; idx: (B, M) int32 in [0, N). Bit-exact
    with take_along_axis (each one-hot row selects exactly one source
    row); bf16 sources copy in a single MXU pass and return bf16."""
    from jax.experimental import pallas as pl

    B, N0, C = src.shape
    M = idx.shape[1]
    N = -(-N0 // LANES) * LANES
    Cp = -(-C // LANES) * LANES
    MC = max(LANES, min(512, (2 * 2**20) // (N * 4) // LANES * LANES))
    if src.dtype not in (jnp.float32, jnp.bfloat16):
        src = src.astype(jnp.float32)
    src = _pad_to(_pad_to(src, N, 1), Cp, 2)
    idx = _pad_to(idx.astype(jnp.int32), MC, 1)
    Mp = idx.shape[1]
    idxl = jnp.broadcast_to(idx[:, :, None], (B, Mp, 1))
    out = pl.pallas_call(
        _make_gather_kernel(N),
        out_shape=jax.ShapeDtypeStruct((B, Mp, Cp), src.dtype),
        grid=(B, Mp // MC),
        in_specs=[
            pl.BlockSpec((1, N, Cp), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, MC, 1), lambda b, c: (b, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, MC, Cp), lambda b, c: (b, c, 0)),
        interpret=interpret,
    )(src, idxl)
    return out[:, :M, :C]
