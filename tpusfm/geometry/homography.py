"""Batched homography estimation (DLT) + transfer-error scoring.

TPU-native replacement for the reference's homography-inlier baseline
ranking (SfMToyLib/SfMStereoUtilities.cpp:51-72, which wraps
cv::findHomography RANSAC at a 10 px threshold): here the DLT runs as a
weighted masked solve so it serves both as the 4-point minimal solver for
batched-hypothesis RANSAC and as the all-inlier refit.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpusfm.geometry.linalg import hartley_normalize_2d, smallest_singular_vector

_EPS = 1e-12


def homography_dlt(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Estimate H (3,3) with x2 ~ H x1 from N>=4 correspondences via DLT.

    x1, x2: (N, 2); w: optional (N,) row weights for masked/padded input.
    Hartley-normalized for f32 conditioning; H is scaled so H[2,2]=1.
    """
    n1, T1 = hartley_normalize_2d(x1, w)
    n2, T2 = hartley_normalize_2d(x2, w)
    u, v = n1[:, 0], n1[:, 1]
    up, vp = n2[:, 0], n2[:, 1]
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    # Rows for -x'h3^T x + h1^T x = 0 and analogous for y'
    r1 = jnp.stack([u, v, one, zero, zero, zero, -up * u, -up * v, -up], axis=1)
    r2 = jnp.stack([zero, zero, zero, u, v, one, -vp * u, -vp * v, -vp], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)
    ww = None if w is None else jnp.concatenate([w, w], axis=0)
    h = smallest_singular_vector(A, ww)
    Hn = h.reshape(3, 3)
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < _EPS, _EPS, H[2, 2])


def homography_transfer_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer error |H x1 - x2| in pixels, (N,).

    Matches cv::findHomography's reprojection-error inlier criterion.
    """
    xh = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=1)
    y = xh @ H.T
    z = y[:, 2:3]
    proj = y[:, :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    return jnp.linalg.norm(proj - x2, axis=1)


def find_homography_inliers(key, x1, x2, mask, threshold_px: float = 10.0, hypotheses: int = 256):
    """H-RANSAC inlier count for baseline-pair ranking.

    Equivalent of SfMStereoUtilities::findHomographyInliers
    (SfMStereoUtilities.cpp:51-72). Returns (num_inliers, H, inlier_mask).
    """
    from tpusfm.ransac import ransac

    def solver(p1, p2):
        H = homography_dlt(p1, p2)
        ok = jnp.all(jnp.isfinite(H))
        return H, ok

    def scorer(H, p1, p2):
        return homography_transfer_error(H, p1, p2)

    best_model, inliers, count = ransac(
        key, (x1, x2), mask,
        solver=solver, scorer=scorer,
        sample_size=4, hypotheses=hypotheses, threshold=threshold_px,
    )
    return count, best_model, inliers
