"""Axis-aligned 3D box math (cxcyczwhd and corner forms), batched.

Rebuild of reference `models/losses.py:27-91` (same math also duplicated in
reference utils/eval_det.py:71-138). All functions are pure jnp and operate
on arbitrary leading batch dims where noted.
"""

import jax.numpy as jnp


def box_cxcyczwhd_to_xyzxyz(x):
    """Center+size -> min/max corners; sizes clamped at 1e-6 (losses.py:27-37)."""
    c, s = x[..., :3], jnp.maximum(x[..., 3:], 1e-6)
    return jnp.concatenate([c - 0.5 * s, c + 0.5 * s], axis=-1)


def box_volume(box):
    """(..., 6) corner boxes -> (...,) volumes."""
    d = box[..., 3:] - box[..., :3]
    return d[..., 0] * d[..., 1] * d[..., 2]


def pairwise_intersection(box_a, box_b):
    """(..., N, 6) x (..., M, 6) corner boxes -> (..., N, M) intersections."""
    lo = jnp.maximum(box_a[..., :, None, :3], box_b[..., None, :, :3])
    hi = jnp.minimum(box_a[..., :, None, 3:], box_b[..., None, :, 3:])
    d = jnp.clip(hi - lo, 0, None)
    return d[..., 0] * d[..., 1] * d[..., 2]


def pairwise_iou3d(box_a, box_b):
    """(..., N, 6) x (..., M, 6) -> iou, union (..., N, M). losses.py:62-67."""
    inter = pairwise_intersection(box_a, box_b)
    union = (
        box_volume(box_a)[..., :, None]
        + box_volume(box_b)[..., None, :]
        - inter
    )
    return inter / union, union


def matched_iou3d(boxes1, boxes2):
    """Elementwise IoU for aligned (..., 6) corner boxes."""
    lo = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    hi = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    d = jnp.clip(hi - lo, 0, None)
    inter = d[..., 0] * d[..., 1] * d[..., 2]
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    return inter / union


def generalized_box_iou3d(boxes1, boxes2):
    """Pairwise GIoU (N, M) for corner boxes (losses.py:70-91)."""
    iou, union = pairwise_iou3d(boxes1, boxes2)
    lo = jnp.minimum(boxes1[:, None, :3], boxes2[None, :, :3])
    hi = jnp.maximum(boxes1[:, None, 3:], boxes2[None, :, 3:])
    d = jnp.clip(hi - lo, 0, None)
    volume = d[..., 0] * d[..., 1] * d[..., 2]
    return iou - (volume - union) / volume


def matched_giou3d(boxes1, boxes2):
    """Elementwise GIoU for aligned (..., 6) corner boxes (the diagonal of
    generalized_box_iou3d without the N*M blowup)."""
    lo_i = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    hi_i = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    di = jnp.clip(hi_i - lo_i, 0, None)
    inter = di[..., 0] * di[..., 1] * di[..., 2]
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    iou = inter / union
    lo = jnp.minimum(boxes1[..., :3], boxes2[..., :3])
    hi = jnp.maximum(boxes1[..., 3:], boxes2[..., 3:])
    d = jnp.clip(hi - lo, 0, None)
    vol = d[..., 0] * d[..., 1] * d[..., 2]
    return iou - (vol - union) / vol
