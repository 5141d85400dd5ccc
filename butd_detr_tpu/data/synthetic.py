"""Synthetic batches with the exact key/shape schema of the real dataset.

Used by tests, the graft entry points, and the benchmark — shapes mirror
`Joint3DDataset.__getitem__` output (reference joint_det_dataset.py:626-790)
after fixed-shape collation.
"""

from typing import Dict, Optional

import numpy as np


def synthetic_batch(
    batch_size: int = 2,
    num_points: int = 50000,
    num_feats: int = 3,  # per-point channels beyond xyz (color)
    max_text_len: int = 64,
    max_num_obj: int = 132,
    max_det_boxes: int = 132,
    num_class_bins: int = 256,
    num_obj_class: int = 485,
    n_true_objects: int = 6,
    n_true_tokens: int = 10,
    n_true_det: int = 20,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    B, N, G, D, L = (
        batch_size, num_points, max_num_obj, max_det_boxes, max_text_len
    )

    pc = (rng.rand(B, N, 3 + num_feats) * 3 + 1).astype(np.float32)

    ids = np.full((B, L), 1, np.int32)
    ids[:, 0] = 0
    ids[:, 1 : 1 + n_true_tokens] = rng.randint(
        4, 5000, (B, n_true_tokens)
    )
    ids[:, 1 + n_true_tokens] = 2
    text_mask = (ids != 1).astype(np.int32)

    center = (rng.rand(B, G, 3) * 3 + 1).astype(np.float32)
    size = (rng.rand(B, G, 3) * 0.5 + 0.2).astype(np.float32)
    box_mask = np.zeros((B, G), np.float32)
    box_mask[:, :n_true_objects] = 1

    pmap = np.zeros((B, G, num_class_bins), np.float32)
    for b in range(B):
        for g in range(n_true_objects):
            s = rng.randint(1, n_true_tokens)
            pmap[b, g, s : s + 2] = 0.5

    pil = np.full((B, N), -1, np.int32)
    for b in range(B):
        for g in range(n_true_objects):
            lo = g * (N // (2 * n_true_objects))
            pil[b, lo : lo + 50] = g

    det_mask = np.zeros((B, D), bool)
    det_mask[:, :n_true_det] = True

    return {
        "point_clouds": pc,
        "text_ids": ids,
        "text_mask": text_mask,
        "det_boxes": np.concatenate(
            [
                (rng.rand(B, D, 3) * 3 + 1).astype(np.float32),
                (rng.rand(B, D, 3) * 0.5 + 0.2).astype(np.float32),
            ],
            axis=-1,
        ),
        "det_class_ids": rng.randint(0, num_obj_class, (B, D)).astype(
            np.int32
        ),
        "det_bbox_label_mask": det_mask,
        "center_label": center,
        "size_gts": size,
        "sem_cls_label": rng.randint(0, 485, (B, G)).astype(np.int32),
        "box_label_mask": box_mask,
        "positive_map": pmap,
        "point_instance_label": pil,
    }
