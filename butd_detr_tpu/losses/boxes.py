"""Axis-aligned 3D box math (cxcyczwhd and corner forms), batched.

Rebuild of reference `models/losses.py:27-91` (same math also duplicated in
reference utils/eval_det.py:71-138). All functions are pure jnp and operate
on arbitrary leading batch dims where noted.

Degenerate-box safety: the reference hard-asserts non-negative sizes
(losses.py:32-34) and would crash the run the first time a size head output
went negative. Here sizes are clamped at 1e-6 instead — but a 1e-6 size is
ABSORBED by f32 at centers of magnitude >~10 (eps(1000) = 6e-5), producing
genuinely zero-width corner boxes; two such boxes give union == 0 and an
0/0 NaN that escapes downstream masking via 0*NaN (observed on padded GT
rows, centers 1000, once a pred size went negative mid-training). All
IoU/GIoU denominators are therefore guarded with _EPS_VOL; real ScanNet
boxes have volumes >= ~1e-6 m^3, so the guard never perturbs them.
"""

import jax.numpy as jnp

_EPS_VOL = 1e-10


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
    return inter / jnp.maximum(union, _EPS_VOL), union


def matched_iou3d(boxes1, boxes2):
    """Elementwise IoU for aligned (..., 6) corner boxes."""
    lo = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    hi = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    d = jnp.clip(hi - lo, 0, None)
    inter = d[..., 0] * d[..., 1] * d[..., 2]
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    return inter / jnp.maximum(union, _EPS_VOL)


def generalized_box_iou3d(boxes1, boxes2):
    """Pairwise GIoU (N, M) for corner boxes (losses.py:70-91)."""
    iou, union = pairwise_iou3d(boxes1, boxes2)
    lo = jnp.minimum(boxes1[:, None, :3], boxes2[None, :, :3])
    hi = jnp.maximum(boxes1[:, None, 3:], boxes2[None, :, 3:])
    d = jnp.clip(hi - lo, 0, None)
    volume = d[..., 0] * d[..., 1] * d[..., 2]
    return iou - (volume - union) / jnp.maximum(volume, _EPS_VOL)


def matched_giou3d(boxes1, boxes2):
    """Elementwise GIoU for aligned (..., 6) corner boxes (the diagonal of
    generalized_box_iou3d without the N*M blowup)."""
    lo_i = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    hi_i = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    di = jnp.clip(hi_i - lo_i, 0, None)
    inter = di[..., 0] * di[..., 1] * di[..., 2]
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    iou = inter / jnp.maximum(union, _EPS_VOL)
    lo = jnp.minimum(boxes1[..., :3], boxes2[..., :3])
    hi = jnp.maximum(boxes1[..., 3:], boxes2[..., 3:])
    d = jnp.clip(hi - lo, 0, None)
    vol = d[..., 0] * d[..., 1] * d[..., 2]
    return iou - (vol - union) / jnp.maximum(vol, _EPS_VOL)
