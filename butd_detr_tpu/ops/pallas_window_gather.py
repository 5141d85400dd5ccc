"""Pallas TPU kernel: windowed row gather for the sa1 grouping.

XLA's TPU row gather is per-ROW-latency bound: the sa1 grouping gather
(131k rows of 6 channels from a 50k-point cloud, reference op
`group_points_kernel`, pointnet2/_ext_src/src/group_points_gpu.cu:13-29)
measures ~30 ms at B=24 while moving only ~75 MB — 300x off the HBM
roofline, and the bf16 A/B (30.1 -> 28.2 ms) shows bytes are not the
bound (PERF.md). The full one-hot MXU form (ops/pallas_scatter.py)
is capped at N <= 4096 sources: a (rows, 50048) one-hot is ~13 TFLOP.

This kernel exploits the same spatial locality the pruned ball query
uses (ops/pallas_ball_query.py): the cloud is stored in Hilbert order
(data/scan.py host presort), so the 64 neighbors of a center — and of a
TILE of centers adjacent in that order — touch only a handful of
128-point chunks. The gather then factors into:

  prep (pure XLA)
    * sort center rows by their min neighbor id (locality proxy), tile
      TC=8 sorted rows;
    * per tile: the ascending list of DISTINCT touched chunks (id >> 7),
      budget KT; per element, its chunk's rank q in that list and its
      lane l = id & 127;
    * gather each tile's KT chunk slabs at CHUNK granularity with
      take_along_axis — 32x fewer rows than the fine gather, each with a
      32x larger payload, which is the regime XLA's gather is good at;

  kernel (per program: GT tiles)
    * step A — chunk select on the MXU: a block-diagonal one-hot
      (rows, GT*KT) contracted with the stacked chunk planes
      (GT*KT, 128) copies each element's chunk row exactly (one-hot
      rows select exactly one source row; f32 payloads use the 3-pass
      hi/mid/lo bf16 split of ops/pallas_scatter, bf16 one pass);
    * step B — lane select on the VPU: mask with the (rows, 128)
      lane one-hot and reduce, yielding the element's value.

  Exactness: every output element is a bit-exact copy of its source
  (tests/test_window_gather.py checks f32 and bf16 against
  take_along_axis). A tile with more distinct touched chunks than KT
  could miss sources, so the wrapper falls back to take_along_axis for
  the whole batch via lax.cond — the same always-exact fallback pattern
  as the pruned ball query.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from butd_detr_tpu.ops.pallas_scatter import _bf16_split3

LANES = 128
TC = 8  # center rows per tile (matches the ball-query tile granularity)
KT = 32  # touched-chunk budget per tile (bench-data stats at the sa1
# shape: mean 11.9, p99 21, max 27 — 16 overflowed every batch)
KT_SMALL = 16  # tight tier: engaged when every tile fits (lax.cond),
# halving the extract matmul K and slab bytes — surface-like scans
# cluster well below bench's uniform-volume tails
GT = 4  # tiles per kernel program (GT=8's working set — one-hots,
# rowsel accumulators, double-buffered slabs — exceeds the 16 MB scoped
# VMEM at the sa1 shape: measured 21.6 MB)
BIG = 2 ** 30


def _extract_kernel(n_ch, n_pass, slab_ref, pos_ref, out_ref):
    """slab_ref (1, GT, KT, C, 128) payload; pos_ref (1, R, 1) i32 with
    pos = (tile_local*KT + chunk_rank)*128 + lane; out_ref (1, R, C)."""
    pos = pos_ref[0]  # (R, 1)
    R = pos.shape[0]
    qg = pos >> 7  # (R, 1) block-diag one-hot column
    l_e = pos & (LANES - 1)

    slab = slab_ref[0]  # (GT, KT, C, 128)
    K = slab.shape[0] * slab.shape[1]

    colq = lax.broadcasted_iota(jnp.int32, (R, K), 1)
    ohq = (qg == colq).astype(jnp.bfloat16)  # exact 0/1
    coll = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    ohl = l_e == coll  # (R, 128) bool

    vals = []
    for ch in range(n_ch):
        feat = slab[:, :, ch, :].reshape(K, LANES)
        comps = (feat,) if n_pass == 1 else _bf16_split3(feat)
        rowsel = None
        for comp in comps:
            part = lax.dot_general(
                ohq, comp, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rowsel = part if rowsel is None else rowsel + part
        # (R, 128) -> (R, 1): the element's lane
        val = jnp.sum(
            jnp.where(ohl, rowsel, 0.0), axis=1, keepdims=True
        )
        vals.append(val)
    out_ref[0] = jnp.concatenate(vals, axis=1).astype(out_ref.dtype)


@partial(jax.jit, static_argnums=(3, 4), static_argnames=("interpret",))
def _window_extract_pallas(slabs, pos, out_dtype_arr, n_ch, ns,
                           interpret=False):
    """slabs (B, Tp, KT, C, 128); pos (B, Tp*TC*ns) i32. Returns
    (B, Tp*TC*ns, C) in out_dtype_arr.dtype."""
    from jax.experimental import pallas as pl

    B, Tp, kt = slabs.shape[0], slabs.shape[1], slabs.shape[2]
    G = Tp // GT
    R = GT * TC * ns
    n_pass = 1 if slabs.dtype == jnp.bfloat16 else 3
    posl = pos.reshape(B, G * R, 1)

    out = pl.pallas_call(
        partial(_extract_kernel, n_ch, n_pass),
        out_shape=jax.ShapeDtypeStruct(
            (B, G * R, n_ch), out_dtype_arr.dtype
        ),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, GT, kt, n_ch, LANES), lambda b, g: (b, g, 0, 0, 0)),
            pl.BlockSpec((1, R, 1), lambda b, g: (b, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, n_ch), lambda b, g: (b, g, 0)),
        interpret=interpret,
    )(slabs, posl)
    return out


class _Prep:
    """Index-side products of the windowed gather, shared across payload
    arrays gathered with the SAME idx (e.g. f32 xyz + bf16 colors at
    sa1): sort/tile/unique/rank work is done once."""

    __slots__ = ("T", "m", "ns", "inv", "chunk_list", "q", "tl",
                 "lanes_e", "count_max", "idx")

    def __init__(self, idx, m, ns):
        B = idx.shape[0]
        idx = idx.astype(jnp.int32)
        lo = jnp.min(idx, axis=2)  # (B, m)
        perm = jnp.argsort(lo, axis=1)
        self.inv = jnp.argsort(perm, axis=1)
        idx_s = jnp.take_along_axis(idx, perm[..., None], axis=1)

        mpad = (-m) % (TC * GT)
        if mpad:
            idx_s = jnp.concatenate(
                [idx_s, jnp.broadcast_to(idx_s[:, :1], (B, mpad, ns))],
                axis=1,
            )
        T = (m + mpad) // TC
        self.T, self.m, self.ns, self.idx = T, m, ns, idx

        cids = (idx_s >> 7).reshape(B, T, TC * ns)
        cs = lax.sort(cids, dimension=2)
        first = jnp.concatenate(
            [jnp.ones((B, T, 1), bool), cs[:, :, 1:] != cs[:, :, :-1]],
            axis=2,
        )
        count_t = jnp.sum(first, axis=2)  # distinct touched chunks/tile
        self.count_max = jnp.max(count_t)

        # ascending distinct chunk list, BIG-padded past each tile count
        neg = jnp.where(first, -cs, -BIG)
        self.chunk_list = -lax.top_k(neg, KT)[0]  # (B, T, KT) ascending

        # element chunk rank within its tile's list (tier-independent:
        # ranks only count REAL entries below cid, never BIG padding)
        self.q = jnp.sum(
            (self.chunk_list[:, :, None, :] < cids[..., None]).astype(
                jnp.int32
            ),
            axis=-1,
        )  # (B, T, TC*ns)
        self.tl = (jnp.arange(T, dtype=jnp.int32) % GT)[None, :, None]
        self.lanes_e = idx_s.reshape(B, T, TC * ns) & (LANES - 1)


def windowed_group_points(points, idx, *, prep=None, interpret=False):
    """out[b, j, k, :] = points[b, idx[b, j, k], :] via the windowed
    Pallas extract; bit-exact with take_along_axis, falling back to it
    (lax.cond) when any tile's touched-chunk count exceeds KT.

    points: (B, N, C) f32/bf16 in spatially local (Hilbert) order for the
    fast path to engage in practice (exactness never depends on order);
    idx: (B, m, ns) int32 in [0, N). `prep` (a _Prep built from the same
    idx) shares the index-side work across multiple payloads.
    """
    B, N, C = points.shape
    _, m, ns = idx.shape
    nc = -(-N // LANES)
    Np = nc * LANES

    p = prep if prep is not None else _Prep(idx, m, ns)
    T = p.T
    idx = p.idx
    inv, chunk_list, q, tl, lanes_e, count_max = (
        p.inv, p.chunk_list, p.q, p.tl, p.lanes_e, p.count_max
    )

    def make_fast(kt):
        """Extract at chunk budget `kt` (the ascending chunk list's first
        kt entries ARE the kt-tier list). Kernel matmul K and slab bytes
        are linear in kt, so the tight tier runs a ~2x smaller extract
        when every tile fits KT_SMALL (the common case on surface-like
        scans; bench's uniform volume needs the full KT)."""

        def fast(_):
            pos = ((q + tl * kt) << 7) | lanes_e
            src = points
            if Np != N:
                src = jnp.concatenate(
                    [src, jnp.zeros((B, Np - N, C), src.dtype)], axis=1
                )
            src_chunks = (
                src.reshape(B, nc, LANES, C)
                .transpose(0, 1, 3, 2)
                .reshape(B, nc, C * LANES)
            )
            cl = jnp.minimum(chunk_list[:, :, :kt], nc - 1).reshape(
                B, T * kt
            )
            slabs = jnp.take_along_axis(
                src_chunks, cl[..., None], axis=1
            ).reshape(B, T, kt, C, LANES)
            out_s = _window_extract_pallas(
                slabs, pos.reshape(B, T * TC * ns), points, C, ns,
                interpret=interpret,
            )  # (B, T*TC*ns, C)
            out_rows = out_s.reshape(B, T * TC, ns * C)[:, : m]
            out = jnp.take_along_axis(out_rows, inv[..., None], axis=1)
            return out.reshape(B, m, ns, C)

        return fast

    def slow(_):
        flat = idx.reshape(B, m * ns)
        return jnp.take_along_axis(
            points, flat[..., None], axis=1
        ).reshape(B, m, ns, C)

    def pick(_):
        return lax.cond(
            count_max > KT_SMALL, make_fast(KT), make_fast(KT_SMALL), None
        )

    return lax.cond(count_max > KT, slow, pick, None)
