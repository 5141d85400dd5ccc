"""Point-cloud ops: the TPU-native replacement for the reference CUDA extension."""

from butd_detr_tpu.ops.pallas_fps import (
    furthest_point_sample_pallas,
    furthest_point_sample_with_xyz_pallas,
)
from butd_detr_tpu.ops.pointcloud import (
    ball_query,
    furthest_point_sample,
    furthest_point_sample_with_xyz,
    furthest_point_sample_xla,
    gather_points,
    group_points,
    group_points_split,
    three_interpolate,
    three_nn,
)

__all__ = [
    "ball_query",
    "furthest_point_sample",
    "furthest_point_sample_pallas",
    "furthest_point_sample_with_xyz",
    "furthest_point_sample_with_xyz_pallas",
    "furthest_point_sample_xla",
    "gather_points",
    "group_points",
    "group_points_split",
    "three_interpolate",
    "three_nn",
]
