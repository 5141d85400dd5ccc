"""Pallas TPU kernel: pruned exact ball query (selection without sort).

The XLA streaming sweep (ops/pointcloud.py) is at XLA's ceiling: its
per-chunk `lax.top_k` lowers to a full variadic sort (~114 of 137 ms at
the sa1 shape, B=8 — see PERF.md). This kernel replaces the sort with
oblivious O(log)-stage roll networks and prunes candidates spatially,
while returning BIT-IDENTICAL results to the reference semantics (first
`nsample` hits by ORIGINAL index, pad-with-first, zero rows —
ball_query_gpu.cu:14-49):

  * candidates are Hilbert-sorted into 128-point chunks with tight AABBs,
    then each chunk is re-sorted by ORIGINAL id (so a chunk's lanes ascend
    by id); per tile of 8 Hilbert-adjacent centers, the first `k_chunks`
    AABB-relevant chunks are gathered (one-hot MXU matmuls — XLA's general
    gather is ~30x slower here);
  * the kernel sweeps chunks branch-free. Per chunk: distances on the
    VPU; hit ranks by a log-shift prefix; stable BUTTERFLY COMPACTION of
    hit ids (7 stages; monotone-displacement routing is collision-free —
    tested exhaustively over all 2^16 masks); a 7-stage roll REVERSAL;
    and an 8-stage BITONIC MERGE into the running best-`nsample` carry.
    Every step is a lane-roll / select / compare — no scalar branches
    (pipeline stalls), no VMEM-spilled carries, no per-chunk tiny matmuls
    (launch latency), no bf16-rounded int payloads (three prior dead
    ends, see PERF.md);
  * GT=16 tiles are processed per grid program as one (128, 128) block:
    the roll networks are dependency chains, so wide blocks amortize the
    per-op latency 16x over the single-tile form.

Exactness guard: a tile with more relevant chunks than `k_chunks` could
miss hits, so the wrapper falls back to the full XLA sweep for the whole
batch via `lax.cond` (per-center-union relevance keeps tile budgets small:
p99 ~30 chunks on surface-like scans at k_chunks=64).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

LANES = 128  # chunk size C == lane width
TR = 8  # centers per tile
GT = 32  # default tiles per grid program (GT*TR sublane rows; r3 sweep:
# 39.0 ms vs 46.5 at gt=16 on the sa1 production shape, bit-identical;
# gt=64 exceeds the 16 MB scoped-VMEM stack at k_chunks=64)
BIGKEY = 2**30  # python int: jnp scalars would be captured as traced consts


def _ball_select_kernel(nsample, r2, k_chunks, gt, n_chunks, coords_ref,
                        ids_ref, cen_ref, out_ref):
    """coords_ref (3*K, gt, C) f32 chunk planes (x block, y block, z block);
    ids_ref (K, gt, C) i32 ascending per (chunk, tile) row;
    cen_ref (3*gt*TR, C) f32, every lane equal; out_ref (gt*TR, C) i32.

    `k_chunks` (static) is the plane stride; `n_chunks` (traced i32 scalar,
    <= k_chunks) is the loop trip count — chunk slots past each tile's
    relevant count hold the pure-sentinel chunk (coords 1e9, zero hits), so
    stopping at the per-program max relevant count is exact.

    `gt` (static) is the tiles-per-program width: every roll/select stage
    operates on a (gt*TR, LANES) block, so the stage-latency-bound chunk
    loop amortizes over gt tiles at once; larger gt also cuts the program
    count (grid programs serialize on the single TensorCore) at the cost
    of a looser per-program trip bound (max over gt tiles)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = gt * TR
    cen = cen_ref[:]
    cx = cen[0:ROWS]
    cy = cen[ROWS : 2 * ROWS]
    cz = cen[2 * ROWS : 3 * ROWS]

    lane = lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    lane2 = lax.broadcasted_iota(jnp.int32, (ROWS, 2 * LANES), 1)

    def tile_to_rows(a):
        # (GT, C) -> (GT*TR, C): each tile's chunk row serves its 8 centers
        return pltpu.repeat(a, TR, axis=0)

    def compact(hit, ids):
        """Stable butterfly compaction of hit ids to the front; id order
        == lane order by construction. Returns ascending ids + BIGKEY."""
        rank = hit.astype(jnp.int32)  # -> inclusive prefix count
        k = 1
        while k < LANES:
            rank = rank + jnp.where(
                lane >= k, pltpu.roll(rank, k, axis=1), 0
            )
            k <<= 1
        disp = jnp.where(hit, lane - (rank - 1), 0)
        val = jnp.where(hit, ids, BIGKEY)
        live = hit.astype(jnp.int32)  # i32: Mosaic cannot rotate i1
        for k in range(7):  # log2(128)
            s = 1 << k
            # pltpu.roll takes non-negative shifts; L-s == -s (mod L)
            inc_val = pltpu.roll(val, LANES - s, axis=1)
            inc_disp = pltpu.roll(disp, LANES - s, axis=1)
            inc_live = pltpu.roll(live, LANES - s, axis=1)
            inc_moves = (inc_live > 0) & ((inc_disp & s) > 0)
            self_moves = (live > 0) & ((disp & s) > 0)
            val = jnp.where(
                inc_moves, inc_val, jnp.where(self_moves, BIGKEY, val)
            )
            disp = jnp.where(
                inc_moves, inc_disp - s, jnp.where(self_moves, 0, disp)
            )
            live = jnp.where(inc_moves, 1, jnp.where(self_moves, 0, live))
        return val

    def merge_desc(carry, comp):
        """Merge a DESCENDING carry with an ascending compacted chunk ->
        the smallest C values, DESCENDING.

        concat(desc, asc) is a valley = bitonic, so no per-chunk lane
        reversal is needed (the r1 kernel reversed `comp` with 7 roll
        stages every chunk; keeping the carry descending moves that cost
        to ONE final reversal outside the loop). Comparators are flipped
        to produce a descending result; the smallest C land in the last
        C lanes."""
        x = jnp.concatenate([carry, comp], axis=1)  # bitonic (ROWS, 2C)
        d = LANES
        while d >= 1:
            up = pltpu.roll(x, 2 * LANES - d, axis=1)
            down = pltpu.roll(x, d, axis=1)
            first = (lane2 & d) == 0
            x = jnp.where(first, jnp.maximum(x, up), jnp.minimum(x, down))
            d //= 2
        return x[:, LANES:]

    # descending carry: the nsample kept ids live in the LAST lanes;
    # everything before them is BIGKEY
    cap_mask = lane < LANES - nsample

    def body(k, state):
        carry, nfound = state
        px = tile_to_rows(coords_ref[pl.ds(k, 1), :, :][0])
        py = tile_to_rows(coords_ref[pl.ds(k_chunks + k, 1), :, :][0])
        pz = tile_to_rows(coords_ref[pl.ds(2 * k_chunks + k, 1), :, :][0])
        dx = cx - px
        dy = cy - py
        dz = cz - pz
        # exact CUDA accumulation order: (dx^2 + dy^2) + dz^2
        d2 = (dx * dx + dy * dy) + dz * dz
        hit = d2 < r2
        ids = tile_to_rows(ids_ref[pl.ds(k, 1), :, :][0])
        comp = compact(hit, ids)
        carry = merge_desc(carry, comp)
        carry = jnp.where(cap_mask, BIGKEY, carry)
        nfound = nfound + jnp.sum(hit.astype(jnp.int32), axis=1,
                                  keepdims=True)
        return carry, nfound

    carry0 = jnp.full((ROWS, LANES), BIGKEY, jnp.int32)
    nf0 = jnp.zeros((ROWS, 1), jnp.int32)
    carry, nfound = lax.fori_loop(0, n_chunks, body, (carry0, nf0))

    # one reversal: descending carry -> ascending output lanes
    k = 1
    while k < LANES:
        carry = jnp.where(
            (lane & k) == 0,
            pltpu.roll(carry, LANES - k, axis=1),
            pltpu.roll(carry, k, axis=1),
        )
        k <<= 1

    count = jnp.minimum(nfound, nsample)  # (ROWS, 1)
    first = jnp.where(count > 0, carry[:, 0:1], 0)
    out_ref[:] = jnp.where(lane < count, carry, first)


@partial(
    jax.jit,
    static_argnums=(0, 1),
    static_argnames=("k_chunks", "gt", "interpret"),
)
def ball_query_select_pallas(
    radius: float,
    nsample: int,
    coords: jax.Array,  # (P2, 3*K, gt, C) f32 gathered chunk planes
    ids: jax.Array,  # (P2, K, gt, C) i32 ascending per chunk row
    centers: jax.Array,  # (P2, 3*gt*TR, C) f32 lane-broadcast centers
    counts: jax.Array,  # (P2,) i32 per-program chunk trip count <= k_chunks
    *,
    k_chunks: int,
    gt: int = GT,
    interpret: bool = False,
) -> jax.Array:
    """Run the selection kernel over P2 groups of `gt` tiles.

    `counts[p]` bounds program p's chunk loop (the max relevant-chunk
    count over its gt tiles, computed by the prep); slots past each
    tile's own count hold the pure-sentinel chunk, so the short loop is
    exact while cutting the dominant roll-network cost from the static
    budget to the data's actual density.

    Returns (P2, gt*TR, C) i32; lanes [0, nsample) hold the
    reference-exact neighbor ids (original indexing).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P2 = coords.shape[0]

    def kernel(counts_ref, c_ref, i_ref, cen_ref, o_ref):
        _ball_select_kernel(
            nsample, float(radius) * float(radius), k_chunks, gt,
            counts_ref[pl.program_id(0)],
            c_ref.at[0], i_ref.at[0], cen_ref.at[0], o_ref.at[0],
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P2,),
        in_specs=[
            pl.BlockSpec((1, 3 * k_chunks, gt, LANES),
                         lambda p, _: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_chunks, gt, LANES),
                         lambda p, _: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * gt * TR, LANES),
                         lambda p, _: (p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gt * TR, LANES), lambda p, _: (p, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P2, gt * TR, LANES), jnp.int32),
        interpret=interpret,
    )(jnp.clip(counts.astype(jnp.int32), 0, k_chunks), coords, ids, centers)
