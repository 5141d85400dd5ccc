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

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def furthest_point_sample_with_xyz(xyz: jax.Array, npoint: int):
    """FPS returning (inds, new_xyz) where new_xyz ==
    gather_points(xyz, inds). On TPU the coordinates come straight out of
    the Pallas kernel (it extracts them per selection step anyway),
    skipping the separate XLA gather; elsewhere this is FPS + gather."""
    if jax.default_backend() == "tpu":
        from butd_detr_tpu.ops.pallas_fps import (
            furthest_point_sample_with_xyz_pallas,
        )

        return furthest_point_sample_with_xyz_pallas(xyz, npoint)
    inds = furthest_point_sample_xla(xyz, npoint)
    return inds, gather_points(xyz, inds)


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
    (sampling_gpu.cu:39-52) is a custom VJP routed through the same
    MXU-matmul scatter as `group_points` (ops/pallas_scatter.py): XLA's
    TPU scatter serializes per row, which makes even the 256-row kps
    feature-gather grad a visible slice of the backward pass.

    Args:
        points: (B, N, C).
        idx: (B, M) int32.

    Returns:
        (B, M, C).
    """
    return _gather_points_vjp(points, idx, points.shape[1])


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_points_vjp(points, idx, n):
    if _use_onehot_gather(points.shape[1], points.dtype):
        from butd_detr_tpu.ops.pallas_scatter import gather_rows_pallas

        return gather_rows_pallas(
            points, idx.astype(jnp.int32)
        ).astype(points.dtype)
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def _gather_points_fwd(points, idx, n):
    return _gather_points_vjp(points, idx, n), idx


def _gather_points_bwd(n, idx, g):
    # bf16 cotangents go in as bf16 (1 MXU pass in the kernel); the
    # scatter accumulates f32 either way and we cast back at the end
    from butd_detr_tpu.ops.pallas_scatter import scatter_rows_add

    grad = scatter_rows_add(
        g, idx.astype(jnp.int32), n
    ).astype(g.dtype)
    zero_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return grad, zero_idx


_gather_points_vjp.defvjp(_gather_points_fwd, _gather_points_bwd)


NO_HIT = -(2**30)  # ball-query miss score; any hit beats it


def _ball_query_scan(
    radius, nsample, xyz, new_xyz, keys=None, chunk_size=256
):
    """Streaming top-k ball-query sweep (the exact-semantics core).

    "The first `nsample` hits by smallest KEY" are exactly the `nsample`
    largest values of score = -key over hit points. The (m, N) candidate
    sweep is a `lax.scan` over N-chunks whose carry is the running
    best-`nsample` scores per center, merged with each chunk's `lax.top_k`.
    No scatters, no data-dependent control flow.

    `keys` (B, N) int32 >= 0 defaults to the candidate position — the
    reference's in-index-order semantics. The pruned path (below) feeds
    ORIGINAL indices as keys so candidates may be processed in any
    (spatially sorted) order while returning reference-identical results.

    Returns (idx (B, m, nsample) int32, nfound (B, m) int32).
    """
    B, N, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    r2 = jnp.float32(radius * radius)
    no_hit = jnp.int32(NO_HIT)

    if keys is None:
        keys = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    pad = (-N) % chunk_size
    if pad:
        # Sentinel points far away: never inside any ball.
        xyz = jnp.concatenate(
            [xyz, jnp.full((B, pad, 3), 1e9, jnp.float32)], axis=1
        )
        keys = jnp.concatenate(
            [keys, jnp.zeros((B, pad), jnp.int32)], axis=1
        )
    num_chunks = (N + pad) // chunk_size
    # (num_chunks, B, chunk, ...) so scan iterates over chunks.
    xyz_chunks = xyz.reshape(B, num_chunks, chunk_size, 3).transpose(1, 0, 2, 3)
    key_chunks = keys.reshape(B, num_chunks, chunk_size).transpose(1, 0, 2)

    def step(best, inp):
        # best: (B, m, nsample) int32 — top scores so far (score = -key).
        xyz_c, key_c = inp
        # Exact per-coordinate distances (matches CUDA accumulation order).
        d2 = (
            (new_xyz[:, :, None, 0] - xyz_c[:, None, :, 0]) ** 2
            + (new_xyz[:, :, None, 1] - xyz_c[:, None, :, 1]) ** 2
            + (new_xyz[:, :, None, 2] - xyz_c[:, None, :, 2]) ** 2
        )  # (B, m, chunk)
        score = jnp.where(d2 < r2, -key_c[:, None, :], no_hit)
        if chunk_size > nsample:
            score, _ = lax.top_k(score, nsample)
        merged = jnp.concatenate([best, score], axis=-1)
        best, _ = lax.top_k(merged, nsample)
        return best, None

    best0 = jnp.full((B, m, nsample), no_hit, jnp.int32)
    best, _ = lax.scan(step, best0, (xyz_chunks, key_chunks))

    hit = best > no_hit  # slots actually filled, in key order
    idx = jnp.where(hit, -best, 0)
    # Pad-with-first: unfilled slots take the first neighbor (slot 0);
    # rows with no hit at all stay 0 (output zero-init, ball_query.cpp:25).
    idx = jnp.where(hit, idx, idx[:, :, :1])
    nfound = jnp.sum(hit.astype(jnp.int32), axis=-1)
    return lax.stop_gradient(idx), nfound


HILBERT_BITS = 10


def _hilbert3(xyz, lo, hi, bits=HILBERT_BITS):
    """30-bit 3D Hilbert index per point: (B, N, 3), bbox (B, 1, 3) -> (B, N).

    Skilling's AxesToTranspose (vectorized with jnp.where) followed by bit
    interleaving. Hilbert beats Morton here because consecutive curve
    positions are always face-adjacent cells — index-contiguous chunks get
    tight bounding boxes, which is what the pruned ball query needs.
    """
    q = jnp.clip(
        ((xyz - lo) / (hi - lo + 1e-6) * (1 << bits)).astype(jnp.int32),
        0, (1 << bits) - 1,
    )
    x = [q[..., 0], q[..., 1], q[..., 2]]
    # inverse undo
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(3):
            flag = (x[i] & Q) > 0
            t = (x[0] ^ x[i]) & P
            x0_inv = x[0] ^ P
            x0_exc = x[0] ^ t
            xi_exc = x[i] ^ t
            x[0] = jnp.where(flag, x0_inv, x0_exc)
            if i != 0:
                x[i] = jnp.where(flag, x[i], xi_exc)
        Q >>= 1
    # Gray encode
    x[1] = x[1] ^ x[0]
    x[2] = x[2] ^ x[1]
    t = jnp.zeros_like(x[0])
    Q = 1 << (bits - 1)
    while Q > 1:
        t = jnp.where((x[2] & Q) > 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(3):
        x[i] = x[i] ^ t
    # interleave, MSB first: bit j of x[0], x[1], x[2] -> index bits
    code = jnp.zeros_like(x[0])
    for j in range(bits - 1, -1, -1):
        for i in range(3):
            code = (code << 1) | ((x[i] >> j) & 1)
    return code


def _onehot_gather(chunk_ids, table, nc):
    """Gather rows of `table` (B, nc, C) by `chunk_ids` (B, K) -> (B, K, C).

    XLA's general gather is catastrophically slow on TPU for this pattern
    (~190 ms at production shape); a one-hot matmul rides the MXU instead
    (<1 ms). EXACT for f32 payloads in 3 bf16 passes: the one-hot operand
    is exact in bf16, the payload splits into hi/mid/lo bf16 components
    with hi + mid + lo == value bit-exactly (each residual keeps <= 8
    significant bits), and the contraction has a single nonzero term per
    output — half the MXU passes of Precision.HIGHEST.

    The optimization_barriers are LOAD-BEARING: XLA:TPU's algebraic
    simplifier rewrites the residual pattern `t - f32(bf16(t))` into
    something inexact (measured: hi+mid+lo was off by a mid-scale ulp and
    the gathered output collapsed to exactly bf16(value)), and would also
    happily refactor `oh@hi + oh@mid + oh@lo` into `oh @ (hi+mid+lo)`
    with the operand sum in bf16. Barriers on the narrowed components and
    on each partial product pin the exact decomposition (verified
    bit-exact vs take_along_axis on TPU at the production shape).
    """
    oh = (chunk_ids[..., None] == jnp.arange(nc, dtype=jnp.int32)).astype(
        jnp.bfloat16
    )
    hi = lax.optimization_barrier(table.astype(jnp.bfloat16))
    r1 = table - hi.astype(jnp.float32)
    mid = lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for comp in (hi, mid, lo):
        part = lax.optimization_barrier(
            jnp.einsum(
                "bkc,bcl->bkl", oh, comp,
                preferred_element_type=jnp.float32,
            )
        )
        out = part if out is None else out + part
    return out


def _ball_query_pruned(
    radius, nsample, xyz, new_xyz, chunk_size, center_tile, k_chunks
):
    """Spatially pruned exact ball query for large N (the sa1 shape).

    The reference scans all N candidates per center because that is free on
    a GPU thread; on TPU the streaming top-k sweep pays for every candidate.
    This path manufactures spatial coherence instead of assuming it (the
    reference's fixed-seed 50k subsample RANDOMIZES point order,
    visual_data_handlers.py:113-122):

      1. Hilbert-sort candidates AND centers (one `lax.sort`, ~9 ms);
         carry original indices alongside.
      2. Split sorted candidates into 128-point chunks; compute chunk AABBs.
      3. For each tile of `center_tile` sorted centers, select the first
         `k_chunks` chunks whose AABB is within `radius` of the tile AABB
         (a superset of every chunk containing a hit for any tile center).
      4. Gather the selected chunks per tile (one-hot MXU matmuls) and run
         the standard sweep per tile with ORIGINAL indices as selection
         keys — so the result is bit-identical to the unpruned sweep, in
         the original center order, regardless of processing order.
      5. Exactness guard: if any tile has more relevant chunks than
         `k_chunks`, fall back to the full sweep via `lax.cond` (the
         "first nsample by original index" may span unscanned chunks, so
         no partial-fill shortcut is sound here).
    """
    B, N, _ = xyz.shape
    m = new_xyz.shape[1]
    C = 64  # AABB chunk: 64 Hilbert-consecutive points (~0.6 m extent)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)

    # --- sort candidates by Morton code, keep original ids --------------
    # Pad with far sentinels (+ one full sentinel chunk as the padding
    # target for tiles with fewer than k_chunks relevant chunks).
    pad = (-N) % C + C
    xyz_p = jnp.concatenate(
        [xyz, jnp.full((B, pad, 3), 1e9, jnp.float32)], axis=1
    )
    ids = jnp.broadcast_to(
        jnp.arange(N + pad, dtype=jnp.int32), (B, N + pad)
    )
    # Force sentinels to sort LAST: the Hilbert curve does not end at the
    # (1023,)*3 corner, so clipped far-away sentinels would otherwise land
    # mid-curve — leaving real points in the pad-target chunk (and then
    # duplicated into tiles via the k_chunks padding).
    code = jnp.where(
        jnp.arange(N + pad) >= N, jnp.int32(2**30), _hilbert3(xyz_p, lo, hi)
    )
    _, xs, ys, zs, ids_s = lax.sort(
        (code, xyz_p[..., 0], xyz_p[..., 1], xyz_p[..., 2], ids),
        dimension=1, num_keys=1,
    )
    nc = (N + pad) // C
    cx = xs.reshape(B, nc, C)
    cy = ys.reshape(B, nc, C)
    cz = zs.reshape(B, nc, C)
    cids = ids_s.reshape(B, nc, C)
    # chunk AABBs (sentinels sort last => real chunks stay tight)
    clo = jnp.stack(
        [cx.min(axis=2), cy.min(axis=2), cz.min(axis=2)], axis=-1
    )  # (B, nc, 3)
    chi = jnp.stack(
        [cx.max(axis=2), cy.max(axis=2), cz.max(axis=2)], axis=-1
    )

    # --- sort centers by Morton code, tile them -------------------------
    MT = center_tile
    mpad = (-m) % MT
    ccode = _hilbert3(new_xyz, lo, hi)
    cid0 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (B, m))
    _, ccx, ccy, ccz, corder = lax.sort(
        (ccode, new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2], cid0),
        dimension=1, num_keys=1,
    )
    cen_s = jnp.stack([ccx, ccy, ccz], axis=-1)  # (B, m, 3)
    if mpad:
        # replicate the last sorted center (keeps tile AABBs tight)
        cen_s = jnp.concatenate(
            [cen_s, jnp.broadcast_to(cen_s[:, -1:], (B, mpad, 3))], axis=1
        )
    T = (m + mpad) // MT
    tiles = cen_s.reshape(B, T, MT, 3)
    tlo = tiles.min(axis=2)  # (B, T, 3)
    thi = tiles.max(axis=2)

    # --- relevant chunks per tile (AABB gap distance < radius) ----------
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            clo[:, None] - thi[:, :, None], tlo[:, :, None] - chi[:, None]
        ),
    )  # (B, T, nc, 3)
    rel = jnp.sum(gap * gap, axis=-1) < radius * radius  # (B, T, nc)
    k_chunks = min(k_chunks, nc)
    count_rel = jnp.sum(rel.astype(jnp.int32), axis=-1)  # (B, T)
    violated = jnp.any(count_rel > k_chunks)

    # first k_chunks relevant chunk ids, ascending; pad -> sentinel chunk
    cidx = jnp.arange(nc, dtype=jnp.int32)
    sc, _ = lax.top_k(jnp.where(rel, -cidx, jnp.int32(NO_HIT)), k_chunks)
    chunk_ids = jnp.where(sc == NO_HIT, nc - 1, -sc)  # (B, T, k_chunks)

    # --- gather selected chunks per tile (one-hot MXU matmuls) ----------
    flat_ids = chunk_ids.reshape(B, T * k_chunks)
    gx = _onehot_gather(flat_ids, cx, nc)
    gy = _onehot_gather(flat_ids, cy, nc)
    gz = _onehot_gather(flat_ids, cz, nc)
    gid = _onehot_gather(flat_ids, cids.astype(jnp.float32), nc)
    KC = k_chunks * C
    cand = jnp.stack([gx, gy, gz], axis=-1).reshape(B * T, KC, 3)
    keys = (
        jnp.round(gid).astype(jnp.int32).reshape(B * T, KC)
    )

    def fast(_):
        idx_t, _nf = _ball_query_scan(
            radius, nsample, cand, tiles.reshape(B * T, MT, 3),
            keys=keys, chunk_size=chunk_size,
        )
        idx_sorted = idx_t.reshape(B, T * MT, nsample)[:, :m]
        # back to the original center order
        inv = jnp.argsort(corder, axis=1)
        return jnp.take_along_axis(idx_sorted, inv[..., None], axis=1)

    def full(_):
        idx, _nf = _ball_query_scan(
            radius, nsample, xyz, new_xyz, chunk_size=chunk_size
        )
        return idx

    return lax.stop_gradient(lax.cond(violated, full, fast, None))


def _ball_query_pruned_pallas(
    radius, nsample, xyz, new_xyz, k_chunks=64, interpret=False,
    presorted=False, gt=None,
):
    """Hilbert-pruned EXACT ball query backed by the Pallas selection
    kernel (ops/pallas_ball_query.py) — the production TPU path for the
    sa1 shape. Prep (pure XLA): Hilbert sort with explicit sentinel keys,
    per-chunk re-sort by ORIGINAL id (the kernel's compaction emits
    id-ascending lists), chunk AABBs, per-center-union relevance per tile
    of 8 Hilbert-adjacent centers, first-k_chunks chunk selection, one-hot
    MXU gathers. Falls back to the full sweep (lax.cond) whenever any
    tile's relevant-chunk count exceeds k_chunks, so results are always
    bit-identical to `_ball_query_scan`.

    `presorted=True` declares the caller already stores points in a
    spatially local order (the data pipeline's host-side Hilbert sort,
    data/scan.py): both device sorts — the big 5-operand candidate sort
    AND the per-chunk id re-sort (positions ascend naturally) — are
    skipped. EXACTNESS DOES NOT DEPEND ON THE CLAIM: chunk AABBs are
    correct for any order; a badly-ordered input only loosens the AABBs,
    which at worst trips the count_max guard into the full-sweep
    fallback (still bit-identical, just slower).
    """
    from butd_detr_tpu.ops.pallas_ball_query import (
        GT as GT_DEFAULT,
        LANES as C,
        TR,
        ball_query_select_pallas,
    )

    if gt is None:
        # tiles per kernel program: stage latency amortizes over gt*TR
        # rows, so larger groups cut the serialized roll-network chains
        # (BUTD_BQ_GT for on-chip A/B; measured tuning in PERF.md).
        # NOTE: read at TRACE time and not part of the jit cache key —
        # changing the env var after the first compile in a process is
        # silently ignored (set it at process start, or pass gt=
        # explicitly, which IS a static arg and recompiles correctly).
        gt = int(os.environ.get("BUTD_BQ_GT", GT_DEFAULT))
    GT = gt

    B, N, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)

    pad = (-N) % C + C  # always >= one pure-sentinel chunk
    xyz_p = jnp.concatenate(
        [xyz, jnp.full((B, pad, 3), 1e9, jnp.float32)], axis=1
    )
    ids = jnp.broadcast_to(
        jnp.arange(N + pad, dtype=jnp.int32), (B, N + pad)
    )
    nc = (N + pad) // C
    if presorted:
        # input order IS the spatial order; sentinels already last and
        # positions ascend within every chunk (kernel id contract holds)
        xs, ys, zs = xyz_p[..., 0], xyz_p[..., 1], xyz_p[..., 2]
        ids_s = ids
        cxc = xs.reshape(B, nc, C)
        cyc = ys.reshape(B, nc, C)
        czc = zs.reshape(B, nc, C)
        idc = ids_s.reshape(B, nc, C)
    else:
        code = jnp.where(
            jnp.arange(N + pad) >= N, jnp.int32(2**30),
            _hilbert3(xyz_p, lo, hi),
        )
        _, xs, ys, zs, ids_s = lax.sort(
            (code, xyz_p[..., 0], xyz_p[..., 1], xyz_p[..., 2], ids),
            dimension=1, num_keys=1,
        )
        cxc = xs.reshape(B, nc, C)
        cyc = ys.reshape(B, nc, C)
        czc = zs.reshape(B, nc, C)
        idc = ids_s.reshape(B, nc, C)
        # kernel contract: every chunk row ascends by ORIGINAL id
        idc, cxc, cyc, czc = lax.sort(
            (idc, cxc, cyc, czc), dimension=2, num_keys=1
        )
    clo = jnp.stack(
        [cxc.min(axis=2), cyc.min(axis=2), czc.min(axis=2)], axis=-1
    )
    chi = jnp.stack(
        [cxc.max(axis=2), cyc.max(axis=2), czc.max(axis=2)], axis=-1
    )

    # --- Hilbert-sorted center tiles of TR ------------------------------
    ccode = _hilbert3(new_xyz, lo, hi)
    cid0 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (B, m))
    _, ccx, ccy, ccz, corder = lax.sort(
        (ccode, new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2], cid0),
        dimension=1, num_keys=1,
    )
    cen_s = jnp.stack([ccx, ccy, ccz], axis=-1)
    mpad = (-m) % TR
    if mpad:
        cen_s = jnp.concatenate(
            [cen_s, jnp.broadcast_to(cen_s[:, -1:], (B, mpad, 3))], axis=1
        )
    T = (m + mpad) // TR
    tiles = cen_s.reshape(B, T, TR, 3)

    # per-center union relevance (tile-AABB tests admit seam outliers)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            clo[:, None, None] - tiles[..., None, :],
            tiles[..., None, :] - chi[:, None, None],
        ),
    )  # (B, T, TR, nc, 3)
    rel = jnp.any(
        jnp.sum(gap * gap, axis=-1) < radius * radius, axis=2
    )  # (B, T, nc)
    k_chunks = min(k_chunks, nc)
    k_small = min(40, k_chunks)  # tight tier: p99 relevance is ~30-35
    count_rel = jnp.sum(rel.astype(jnp.int32), axis=-1)
    count_max = jnp.max(count_rel)

    cidx = jnp.arange(nc, dtype=jnp.int32)
    sc, _ = lax.top_k(jnp.where(rel, -cidx, jnp.int32(NO_HIT)), k_chunks)
    chunk_ids = jnp.where(sc == NO_HIT, nc - 1, -sc)  # (B, T, k_chunks)
    # top_k(-cidx) descending == relevant chunks in ascending order, so
    # the first k_small entries ARE the k_small-tier selection
    inv = jnp.argsort(corder, axis=1)

    # ---- balance kernel programs by tile density --------------------------
    # The kernel's chunk-loop trip is the per-program MAX relevant count
    # over its GT tiles (counts at the sa1 shape: mean ~13.5, max ~33), so
    # grouping similar-count tiles turns sum-of-maxes into ~sum-of-means.
    # Tile order is free: rows are unpermuted per ORIGINAL center below.
    tile_perm = jnp.argsort(count_rel, axis=1)  # (B, T) new slot -> old tile
    chunk_ids = jnp.take_along_axis(chunk_ids, tile_perm[..., None], axis=1)
    tiles = jnp.take_along_axis(tiles, tile_perm[..., None, None], axis=1)
    count_rel = jnp.take_along_axis(count_rel, tile_perm, axis=1)
    # fold the reorder into the center unpermute: sorted-center j (old row
    # layout tile j//TR, slot j%TR) now lives on row inv_tile[j//TR]*TR+j%TR
    tile_inv = jnp.argsort(tile_perm, axis=1)  # old tile -> new slot
    inv = (
        jnp.take_along_axis(tile_inv, inv // TR, axis=1) * TR + inv % TR
    )

    # pad tile count to a multiple of GT (kernel processes GT at once)
    tpad = (-T) % GT
    cids_p = chunk_ids
    tiles_p = tiles
    counts_t = count_rel  # (B, T) per-tile relevant-chunk counts
    if tpad:
        # pad by replicating the FIRST tile: after the density sort it has
        # the smallest count, so padding never raises a program's trip
        # bound (pad rows are never selected by `inv`)
        cids_p = jnp.concatenate(
            [cids_p, jnp.broadcast_to(
                cids_p[:, :1], (B, tpad, k_chunks))], axis=1
        )
        tiles_p = jnp.concatenate(
            [tiles_p, jnp.broadcast_to(
                tiles_p[:, :1], (B, tpad, TR, 3))], axis=1
        )
        counts_t = jnp.concatenate(
            [counts_t, jnp.broadcast_to(counts_t[:, :1], (B, tpad))],
            axis=1,
        )
    Tp = T + tpad
    G = Tp // GT
    P2 = B * G
    # per-program (16-tile group) chunk-loop bound: beyond each tile's own
    # relevant count its chunk slots are the pure-sentinel chunk, so the
    # max over the group is an exact trip count for the kernel
    counts_prog = counts_t.reshape(B, G, GT).max(axis=2).reshape(P2)
    # kernel rows are r*GT + tile (pltpu.repeat tiles rather than
    # blocks, so the chunk row for tile t lands on rows {t, GT+t, ...})
    cen_b = jnp.broadcast_to(
        tiles_p.reshape(B, G, GT, TR, 3)
        .transpose(0, 1, 4, 3, 2)  # (B, G, 3, TR, GT)
        .reshape(B, G, 3 * TR * GT, 1),
        (B, G, 3 * TR * GT, C),
    ).reshape(P2, 3 * TR * GT, C)

    def make_fast(k):
        """Kernel launch at chunk budget k. Kernel time is linear in k,
        so the common case (every tile's relevance fits k_small) runs a
        ~40% shorter chunk loop; the k_chunks tier only triggers when
        some tile needs more, and the full sweep only on overflow."""

        def fast(_):
            flat = cids_p[:, :, :k].reshape(B, Tp * k)
            gx = _onehot_gather(flat, cxc, nc)
            gy = _onehot_gather(flat, cyc, nc)
            gz = _onehot_gather(flat, czc, nc)
            gid = jnp.round(
                _onehot_gather(flat, idc.astype(jnp.float32), nc)
            ).astype(jnp.int32)

            def group(a):  # (B, Tp*k, C) -> (P2, k, GT, C)
                return (
                    a.reshape(B, G, GT, k, C)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(P2, k, GT, C)
                )

            coords = jnp.concatenate(
                [group(gx), group(gy), group(gz)], axis=1
            )  # (P2, 3k, GT, C)
            gids = group(gid)
            out = ball_query_select_pallas(
                float(radius), nsample, coords, gids, cen_b, counts_prog,
                k_chunks=k, gt=GT, interpret=interpret,
            )
            # keep ALL Tp*TR rows for the gather: with density-balanced
            # tile order a real center may live past row m (inv spans the
            # full padded row range)
            idx_sorted = (
                out.reshape(B, G, TR, GT, C)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, Tp * TR, C)[:, :, :nsample]
            )
            return jnp.take_along_axis(idx_sorted, inv[..., None], axis=1)

        return fast

    def full(_):
        idx, _nf = _ball_query_scan(radius, nsample, xyz, new_xyz)
        return idx

    def pruned(_):
        if k_small == k_chunks:
            return make_fast(k_chunks)(None)
        return lax.cond(
            count_max > k_small, make_fast(k_chunks), make_fast(k_small),
            None,
        )

    return lax.stop_gradient(
        lax.cond(count_max > k_chunks, full, pruned, None)
    )


@partial(
    jax.jit,
    static_argnums=(0, 1),
    static_argnames=("chunk_size", "prune_threshold", "center_tile",
                     "k_chunks", "use_pallas", "presorted"),
)
def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    chunk_size: int = 256,
    prune_threshold: int = 0,
    center_tile: int = 16,
    k_chunks: int = 160,
    use_pallas: Optional[bool] = None,
    presorted: bool = False,
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

    Backend selection (all paths are bit-identical, tests/test_ops.py):
      * On TPU, large shapes (N >= 16384, m >= 64, nsample <= 128) default
        to the Pallas Hilbert-pruned selection kernel
        (`ops/pallas_ball_query.py`) — the production path; it self-falls
        back to the full sweep via lax.cond when pruning budgets overflow.
        `use_pallas=False` forces the XLA paths instead (for benchmarking
        or working around a Mosaic issue); `use_pallas=True` forces the
        kernel whenever the shape qualifies. On non-TPU backends the
        kernel is never used.
      * Otherwise, `prune_threshold` > 0 routes inputs with
        N >= prune_threshold to the pure-XLA pruned path
        (`_ball_query_pruned`); the default 0 disables it (its prep costs
        more than the scan saves at measured shapes).
      * The fallback is the direct chunked sweep (`_ball_query_scan`),
        tuned by `chunk_size`.

    Args:
        radius: ball radius.
        nsample: max neighbors per center.
        xyz: (B, N, 3) candidate points.
        new_xyz: (B, m, 3) query centers.

    Returns:
        (B, m, nsample) int32 indices into N. Non-differentiable.
    """
    N, m = xyz.shape[1], new_xyz.shape[1]
    pallas_valid = (
        jax.default_backend() == "tpu" and nsample <= 128 and m >= 8
    )
    if use_pallas is None:
        # auto heuristic: the kernel wins at the large tiers
        use_pallas = pallas_valid and N >= 16384 and m >= 64
    if use_pallas and pallas_valid:
        # production sa1 path: Pallas selection kernel over Hilbert-pruned
        # tiles (exact; self-falls-back to the full sweep when pruning
        # budgets are exceeded). presorted=True (data-pipeline Hilbert
        # order, data/scan.py) skips both device prep sorts.
        return _ball_query_pruned_pallas(float(radius), nsample, xyz,
                                         new_xyz, presorted=presorted)
    if prune_threshold and N >= prune_threshold and m >= center_tile:
        return _ball_query_pruned(
            float(radius), nsample, xyz, new_xyz,
            chunk_size, center_tile, k_chunks,
        )
    idx, _ = _ball_query_scan(
        float(radius), nsample, xyz, new_xyz, chunk_size=chunk_size
    )
    return idx


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _group_points_vjp(points, idx, n):
    B, N, C = points.shape
    _, m, ns = idx.shape
    if _use_window_gather(N, m, ns, points.dtype):
        # production sa1 path: windowed Pallas gather over the
        # Hilbert-local touched-chunk slabs (bit-exact; self-falls-back
        # to take_along_axis when tile budgets overflow)
        from butd_detr_tpu.ops.pallas_window_gather import (
            windowed_group_points,
        )

        return windowed_group_points(points, idx)
    flat_idx = idx.reshape(B, m * ns).astype(jnp.int32)
    if _use_onehot_gather(N, points.dtype):
        from butd_detr_tpu.ops.pallas_scatter import gather_rows_pallas

        flat = gather_rows_pallas(points, flat_idx).astype(points.dtype)
    else:
        flat = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return flat.reshape(B, m, ns, C)


def _use_window_gather(n: int, m: int, ns: int, dtype) -> bool:
    """Route the big Hilbert-local row gathers (sa1: 131k rows from a 50k
    source) through the windowed Pallas kernel. A/B knob
    BUTD_WINDOW_GATHER; small sources stay on take_along/one-hot paths
    (their one-hot form is already cheap)."""
    import os

    return (
        os.environ.get("BUTD_WINDOW_GATHER", "0") == "1"
        and jax.default_backend() == "tpu"
        and n >= 16384
        and m >= 512
        and ns >= 32
        and dtype in (jnp.float32, jnp.bfloat16)
    )


def _use_onehot_gather(n: int, dtype) -> bool:
    """Route small-source f32 row gathers through the one-hot MXU kernel.

    A/B switch: BUTD_ONEHOT_GATHER=1 enables on TPU for N <= MAX_N (same
    budget as the scatter mirror); default off pending hardware
    measurement vs the in-model take_along_axis cost (PERF.md). bf16
    sources (the backbone_bf16 default) take a single MXU pass."""
    import os

    from butd_detr_tpu.ops.pallas_scatter import MAX_N

    return (
        os.environ.get("BUTD_ONEHOT_GATHER", "0") == "1"
        and jax.default_backend() == "tpu"
        and n <= MAX_N
        and dtype in (jnp.float32, jnp.bfloat16)
    )


def _group_points_fwd(points, idx, n):
    return _group_points_vjp(points, idx, n), idx


def _group_points_bwd(n, idx, g):
    from butd_detr_tpu.ops.pallas_scatter import scatter_rows_add

    B, m, ns = idx.shape
    C = g.shape[-1]
    grad = scatter_rows_add(
        g.reshape(B, m * ns, C),
        idx.reshape(B, m * ns),
        n,
    ).astype(g.dtype)
    zero_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return grad, zero_idx


_group_points_vjp.defvjp(_group_points_fwd, _group_points_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _group_points_split_vjp(xyz, feats, idx, n):
    B, N, _ = xyz.shape
    _, m, ns = idx.shape
    if _use_window_gather(N, m, ns, xyz.dtype):
        # windowed two-dtype extract with SHARED index-side prep: xyz
        # stays f32 (3-pass exact copies), features ride the 1-pass bf16
        # form — 12 channel-passes instead of 18 at sa1
        from butd_detr_tpu.ops.pallas_window_gather import (
            _Prep,
            windowed_group_points,
        )

        prep = _Prep(idx.astype(jnp.int32), m, ns)
        gx = windowed_group_points(xyz, idx, prep=prep)
        gf = windowed_group_points(feats, idx, prep=prep)
        return gx, gf
    # fallback: ONE concatenated row gather (per-row-cost dominated, so
    # splitting would double it); the feats leg casts back afterwards
    cat = jnp.concatenate([xyz, feats.astype(xyz.dtype)], axis=-1)
    flat_idx = idx.reshape(B, m * ns).astype(jnp.int32)
    g = jnp.take_along_axis(cat, flat_idx[..., None], axis=1).reshape(
        B, m, ns, -1
    )
    return g[..., :3], g[..., 3:].astype(feats.dtype)


def _group_points_split_fwd(xyz, feats, idx, n):
    return _group_points_split_vjp(xyz, feats, idx, n), idx


def _group_points_split_bwd(n, idx, g):
    from butd_detr_tpu.ops.pallas_scatter import scatter_rows_add

    gx, gf = g
    B, m, ns = idx.shape
    grad_x = scatter_rows_add(
        gx.reshape(B, m * ns, -1), idx.reshape(B, m * ns), n
    ).astype(gx.dtype)
    grad_f = scatter_rows_add(
        gf.reshape(B, m * ns, -1), idx.reshape(B, m * ns), n
    ).astype(gf.dtype)
    zero_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return grad_x, grad_f, zero_idx


_group_points_split_vjp.defvjp(_group_points_split_fwd,
                               _group_points_split_bwd)


def group_points_split(xyz: jax.Array, feats: jax.Array,
                       idx: jax.Array):
    """Gather xyz (kept f32-exact) and features (kept in their own
    dtype, e.g. bf16) with one shared index prep. Returns
    (grouped_xyz (B, m, ns, 3), grouped_feats (B, m, ns, Cf)).

    Same semantics as `group_points` on the concatenated array (reference
    group_points_gpu.cu:13-29) with the feats leg cast — used by the
    bf16-backbone QueryAndGroup where the downstream SharedMLP casts
    features to bf16 anyway, so gathering them in bf16 is bit-identical
    end to end while cutting the windowed kernel's MXU passes by a third.
    """
    return _group_points_split_vjp(xyz, feats, idx, xyz.shape[1])


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Group point features: out[b, j, k] = points[b, idx[b, j, k]].

    Channels-last analogue of `group_points_kernel`
    (reference group_points_gpu.cu:13-29). The scatter-add gradient
    (group_points_gpu.cu:45-62, CUDA atomicAdd) is a custom VJP: XLA's TPU
    scatter serializes per row and dominated the train-step backward, so on
    TPU the grad is computed as one-hot MXU matmuls (ops/pallas_scatter.py);
    off-TPU it is the plain .at[].add autodiff form.

    Args:
        points: (B, N, C).
        idx: (B, m, nsample) int32.

    Returns:
        (B, m, nsample, C).
    """
    return _group_points_vjp(points, idx, points.shape[1])


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
