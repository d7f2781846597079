"""Batched multi-view geometry primitives (pure jnp, f32, vmap-friendly).

TPU-native re-design of the reference's two-view geometry layer
(SfMToyLib/SfMStereoUtilities.{h,cpp} and
legacy/SfMToyLib_Old/{FindCameraMatrices,Triangulation}.{h,cpp}):
every solver is batched over hypotheses/points instead of looping.
"""

from tpusfm.geometry.linalg import (
    hartley_normalize_2d,
    skew,
    smallest_singular_vector,
)
from tpusfm.geometry.homography import (
    homography_dlt,
    homography_transfer_error,
    find_homography_inliers,
)
from tpusfm.geometry.essential import (
    essential_8pt,
    sampson_error,
    decompose_essential_hz,
    decompose_essential_horn90,
    pick_pose_by_cheirality,
    find_camera_from_match,
)
from tpusfm.geometry.triangulation import (
    triangulate_dlt,
    triangulate_hartley_sturm,
    triangulate_views,
    reprojection_errors,
)
from tpusfm.geometry.pnp import pnp_dlt, refine_pose_gn, find_camera_pose_2d3d

__all__ = [
    "hartley_normalize_2d",
    "skew",
    "smallest_singular_vector",
    "homography_dlt",
    "homography_transfer_error",
    "find_homography_inliers",
    "essential_8pt",
    "sampson_error",
    "decompose_essential_hz",
    "decompose_essential_horn90",
    "pick_pose_by_cheirality",
    "find_camera_from_match",
    "triangulate_dlt",
    "triangulate_hartley_sturm",
    "triangulate_views",
    "reprojection_errors",
    "pnp_dlt",
    "refine_pose_gn",
    "find_camera_pose_2d3d",
]
