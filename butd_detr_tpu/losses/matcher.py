"""On-device batched Hungarian matching (exact, JV augmenting-path).

The reference ships the cost matrix to the CPU and runs
`scipy.optimize.linear_sum_assignment` per batch element every step
(models/losses.py:318-324) — a device->host sync in the hot loop. Here the
assignment runs on the TPU as a Jonker-Volgenant shortest-augmenting-path
solver expressed with `lax.while_loop`/`fori_loop` over fixed shapes and
vmapped over the batch (SURVEY.md section 7, design departure 1). Exact
optimum, same as scipy up to cost ties.

Shapes are fixed: rows = padded targets (G), cols = queries (Q), G <= Q.
Invalid (padding) target rows are given constant cost 0; since G <= Q there
are always free columns left, so the restriction of the optimum to valid
rows is itself optimal, and padded matches are ignored downstream via
`box_label_mask`.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from butd_detr_tpu.losses.boxes import (
    box_cxcyczwhd_to_xyzxyz,
    generalized_box_iou3d,
)

INF = jnp.float32(1e9)


def _lsa_single(cost, n_valid=None):
    """Solve min-cost assignment for one (G, Q) matrix, G <= Q.

    Returns col4row: (G,) int32 — the column assigned to each row.
    Augmenting-path algorithm with dual potentials (u, v), matching
    scipy's rectangular LSAP semantics.

    `n_valid` (traced scalar) limits the solve to the first n rows — the
    valid (unpadded) targets. This matches the reference exactly (scipy
    runs on the cost matrix sliced to the true target count,
    losses.py:318-324) and cuts the sequential row loop from G=132 to the
    actual object count (usually <= ~10).
    """
    G, Q = cost.shape
    cost = cost.astype(jnp.float32)
    if n_valid is None:
        n_valid = jnp.int32(G)

    def solve_row(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra-style shortest augmenting path from cur_row.
        def sp_cond(s):
            # guard: at most Q path extensions (each marks one column);
            # prevents an infinite loop on malformed (NaN) costs
            *_, sink, _, it = s
            return (sink < 0) & (it < Q)

        def sp_body(s):
            i, min_val, remaining, spc, path, sink, sr, it = s
            sr = sr.at[i].set(True)
            r = min_val + cost[i] - u[i] - v  # (Q,)
            upd = (r < spc) & remaining
            path = jnp.where(upd, i, path)
            spc = jnp.where(upd, r, spc)
            masked = jnp.where(remaining, spc, INF)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            is_free = row4col[j] < 0
            sink = jnp.where(is_free, j, jnp.int32(-1))
            i = jnp.where(is_free, i, row4col[j])
            remaining = remaining.at[j].set(False)
            return i, min_val, remaining, spc, path, sink, sr, it + 1

        init = (
            cur_row,
            jnp.float32(0.0),
            jnp.ones((Q,), bool),
            jnp.full((Q,), INF),
            jnp.zeros((Q,), jnp.int32),
            jnp.int32(-1),
            jnp.zeros((G,), bool),
            jnp.int32(0),
        )
        _, min_val, remaining, spc, path, sink, sr, _ = lax.while_loop(
            sp_cond, sp_body, init
        )
        sc = ~remaining  # scanned columns

        # --- dual updates (scipy rectangular_lsap semantics)
        u = u.at[cur_row].add(min_val)
        other_sr = sr & (
            jnp.arange(G) != cur_row
        )
        spc_at_rowcol = jnp.where(
            col4row >= 0, spc[jnp.clip(col4row, 0, Q - 1)], 0.0
        )
        u = jnp.where(other_sr, u + min_val - spc_at_rowcol, u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment along the alternating path back to cur_row.
        def aug_cond(s):
            done, _, _, _, it = s
            return ~done & (it <= G)  # guard vs malformed paths

        def aug_body(s):
            _, j, col4row, row4col, it = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev_j = col4row[i]
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return done, prev_j, col4row, row4col, it + 1

        _, _, col4row, row4col, _ = lax.while_loop(
            aug_cond, aug_body,
            (jnp.bool_(False), sink, col4row, row4col, jnp.int32(0)),
        )
        return u, v, col4row, row4col

    u0 = jnp.zeros((G,), jnp.float32)
    v0 = jnp.zeros((Q,), jnp.float32)
    col4row0 = jnp.full((G,), -1, jnp.int32)
    row4col0 = jnp.full((Q,), -1, jnp.int32)

    def row_cond(s):
        cur_row, _ = s
        return cur_row < n_valid

    def row_body(s):
        cur_row, state = s
        return cur_row + 1, solve_row(cur_row, state)

    _, (_, _, col4row, _) = lax.while_loop(
        row_cond, row_body, (jnp.int32(0), (u0, v0, col4row0, row4col0))
    )
    # padded rows keep col4row == -1; clamp to 0 so downstream gathers are
    # in-bounds (they are masked by box_label_mask anyway)
    return jnp.maximum(col4row, 0)


@jax.jit
def batched_linear_sum_assignment(cost, n_valid=None):
    """cost: (B, G, Q) with G <= Q -> (B, G) int32 column-per-row.
    n_valid: optional (B,) count of valid rows per matrix."""
    if n_valid is None:
        return jax.vmap(_lsa_single)(cost)
    return jax.vmap(_lsa_single)(cost, n_valid.astype(jnp.int32))


@partial(jax.jit, static_argnums=(5, 6, 7))
def matcher_cost_matrix(
    pred_logits,  # (B, Q, C)
    pred_boxes,  # (B, Q, 6) cxcyczwhd
    positive_map,  # (B, G, C)
    gt_boxes,  # (B, G, 6) cxcyczwhd
    box_label_mask,  # (B, G) 1 = valid
    cost_class: float = 1.0,
    cost_bbox: float = 0.0,
    cost_giou: float = 2.0,
    tgt_labels=None,  # (B, G) int — enables the non-soft-token cost
):
    """Matching cost (reference HungarianMatcher.forward, losses.py:279-318,
    instantiated with weights (1, 0, 2) at main_utils.py:243). Invalid
    target columns get constant 0 cost.

    Class cost: soft-token (-prob @ positive_map^T, losses.py:290-296) by
    default; when `tgt_labels` is given, the DETR-style
    `-prob[:, tgt_ids]` branch (losses.py:297-302, soft_token=False)."""
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    if tgt_labels is not None:
        # cost[b, q, g] = -prob[b, q, tgt_labels[b, g]]
        cost_cls = -jnp.take_along_axis(
            prob, tgt_labels[:, None, :].astype(jnp.int32), axis=-1
        )
    else:
        cost_cls = -jnp.einsum("bqc,bgc->bqg", prob, positive_map)
    cost_l1 = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1
    )
    cost_g = -jax.vmap(generalized_box_iou3d)(
        box_cxcyczwhd_to_xyzxyz(pred_boxes),
        box_cxcyczwhd_to_xyzxyz(gt_boxes),
    )
    C = cost_bbox * cost_l1 + cost_class * cost_cls + cost_giou * cost_g
    C = jnp.where(box_label_mask[:, None, :] > 0, C, 0.0)
    return C  # (B, Q, G)


def hungarian_match(
    pred_logits, pred_boxes, positive_map, gt_boxes, box_label_mask,
    cost_class: float = 1.0, cost_bbox: float = 0.0, cost_giou: float = 2.0,
    tgt_labels=None,
):
    """Returns assignment (B, G) int32: query index matched to each target
    (valid for padded targets too, but those are masked downstream).
    `tgt_labels` switches the class cost to the non-soft-token branch."""
    C = matcher_cost_matrix(
        pred_logits, pred_boxes, positive_map, gt_boxes, box_label_mask,
        cost_class, cost_bbox, cost_giou, tgt_labels,
    )
    # NaN costs would otherwise corrupt the comparisons inside the solver;
    # map them to a large finite value (training diverged anyway if it
    # happens — the guard keeps the step from wedging)
    C = jnp.nan_to_num(lax.stop_gradient(C), nan=1e6, posinf=1e6,
                       neginf=-1e6)
    return batched_linear_sum_assignment(
        jnp.transpose(C, (0, 2, 1)),  # rows = targets
        n_valid=jnp.sum(box_label_mask > 0, axis=-1),
    )


def scipy_match_oracle(cost_bqg, box_label_mask):
    """Host-side scipy oracle for tests (the reference's exact path)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost_bqg)
    mask = np.asarray(box_label_mask)
    B, Q, G = cost.shape
    out = np.full((B, G), -1, np.int64)
    for b in range(B):
        g = int(mask[b].sum())
        rows, cols = linear_sum_assignment(cost[b, :, :g])
        # rows = queries, cols = targets
        out[b, cols] = rows
    return out
