"""Minimal two-view reconstruction pipeline.

Equivalent of the legacy ``Distance`` stereo-pair variant of IDistance
(legacy/SfMToyLib_Old/Distance.h:40-133: OnlyMatchFeatures ->
FindCameraMatrices -> TriangulatePoints): one matched pair in, relative
pose + triangulated cloud out. Runs entirely on the batched device
kernels of the full pipeline.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.config import SfMConfig
from tpusfm.pipeline.incremental import Reconstruction, SfMPipeline
from tpusfm.types import Intrinsics


def reconstruct_two_view(
    img1: np.ndarray,
    img2: np.ndarray,
    config: Optional[SfMConfig] = None,
    intrinsics: Optional[Intrinsics] = None,
    rgb1: Optional[np.ndarray] = None,
    rgb2: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Reconstruction:
    """Reconstruct from exactly two grayscale images (H, W) in [0, 1]."""
    cfg = config or SfMConfig()
    gray = np.stack([np.asarray(img1, np.float32), np.asarray(img2, np.float32)])
    rgb = None
    if rgb1 is not None and rgb2 is not None:
        rgb = np.stack([rgb1, rgb2])
    pipe = SfMPipeline(gray, cfg, images_rgb=rgb, intrinsics=intrinsics, seed=seed)
    pipe.extract()
    pipe.match()
    if not pipe.find_baseline_triangulation():
        raise RuntimeError("two-view reconstruction failed: no valid pose "
                           "(legacy Distance pipeline fails the same way)")
    err = pipe.mean_reprojection_error()
    return Reconstruction(
        poses=pipe.poses.copy(),
        pose_valid=pipe.pose_valid.copy(),
        xyz=pipe.xyz[: pipe.n_points].copy(),
        rgb=pipe._point_colors(),
        obs=pipe.obs[: pipe.n_points].copy(),
        K=np.array(jax.device_get(pipe.intr.K)),
        mean_reprojection_error=err,
        stats=dict(pipe._timings),
    )
