"""Batched triangulation: linear DLT + Hartley–Sturm iterative refinement.

TPU-native re-design of the reference's two triangulators:
- cv::triangulatePoints DLT path (SfMToyLib/SfMStereoUtilities.cpp:120-206)
- Hartley–Sturm iterative reweighting (legacy
  SfMToyLib_Old/Triangulation.cpp:43-123: LinearLSTriangulation +
  IterativeLinearLSTriangulation, <=10 iterations, eps=1e-4)

Instead of the legacy OpenMP loop over points (Triangulation.cpp:189), all
points triangulate at once via vmap; the iterative refinement is a fixed
lax.fori_loop so the whole op compiles to one fused XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusfm import camera

_EPS = 1e-9


def _dlt_rows(P: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows for one view: x*p3 - p1, y*p3 - p2. P (3,4), xy (2,)."""
    return jnp.stack([
        xy[0] * P[2] - P[0],
        xy[1] * P[2] - P[1],
    ])


def _solve_homogeneous_4(A: jnp.ndarray) -> jnp.ndarray:
    """Smallest eigenvector of A^T A for A (k,4) -> dehomogenized (3,)."""
    G = A.T @ A
    _, V = jnp.linalg.eigh(G)
    Xh = V[:, 0]
    w = Xh[3]
    return Xh[:3] / jnp.where(jnp.abs(w) < _EPS, jnp.sign(w) * _EPS + _EPS, w)


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Linear DLT triangulation. P1,P2 (3,4) (normalized, i.e. [R|t]);
    x1,x2 (N,2) normalized camera coords. Returns (N,3) world points."""

    def one(a, b):
        A = jnp.concatenate([_dlt_rows(P1, a), _dlt_rows(P2, b)], axis=0)
        return _solve_homogeneous_4(A)

    return jax.vmap(one)(x1, x2)


def triangulate_hartley_sturm(
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    iterations: int = 10,
) -> jnp.ndarray:
    """Iterative linear-LS triangulation (Hartley & Sturm reweighting).

    Re-designs legacy IterativeLinearLSTriangulation
    (Triangulation.cpp:87-123): rows are reweighted by the inverse
    projective depth w = p3^T X of each view and re-solved; the legacy
    early-break at |w - w_prev| < 1e-4 becomes a fixed iteration count
    (the extra solves are free inside one fused XLA loop; reweighting is
    a contraction so surplus iterations are harmless).
    """

    def one(a, b):
        def body(_, X):
            Xh = jnp.concatenate([X, jnp.ones((1,), X.dtype)])
            w1 = jnp.maximum(jnp.abs(P1[2] @ Xh), _EPS)
            w2 = jnp.maximum(jnp.abs(P2[2] @ Xh), _EPS)
            A = jnp.concatenate(
                [_dlt_rows(P1, a) / w1, _dlt_rows(P2, b) / w2], axis=0
            )
            return _solve_homogeneous_4(A)

        X0 = _solve_homogeneous_4(
            jnp.concatenate([_dlt_rows(P1, a), _dlt_rows(P2, b)], axis=0)
        )
        return jax.lax.fori_loop(0, iterations, body, X0)

    return jax.vmap(one)(x1, x2)


def reprojection_errors(Rt: jnp.ndarray, K: jnp.ndarray, pts3d: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel reprojection error per point (N,)."""
    proj = camera.project_points(Rt, K, pts3d)
    return jnp.linalg.norm(proj - uv, axis=1)


def depths(Rt: jnp.ndarray, pts3d: jnp.ndarray) -> jnp.ndarray:
    """Per-point depth in the camera frame (N,)."""
    return camera.transform_points(Rt, pts3d)[:, 2]


def triangulate_views(
    Rt1: jnp.ndarray,
    Rt2: jnp.ndarray,
    K: jnp.ndarray,
    Kinv: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    max_reprojection_error: float = 10.0,
    iterations: int = 10,
):
    """Full triangulation stage with the reference's acceptance gates.

    Equivalent of SfMStereoUtilities::triangulateViews
    (SfMStereoUtilities.cpp:120-206): undistort (normalize) points,
    triangulate, then keep only points whose reprojection error is
    <= 10 px in BOTH views (:184-190). Returns (xyz (N,3), keep (N,),
    err1 (N,), err2 (N,)).
    """
    x1 = camera.normalize_points(Kinv, uv1)
    x2 = camera.normalize_points(Kinv, uv2)
    xyz = triangulate_hartley_sturm(Rt1, Rt2, x1, x2, iterations)
    e1 = reprojection_errors(Rt1, K, xyz, uv1)
    e2 = reprojection_errors(Rt2, K, xyz, uv2)
    in_front = (depths(Rt1, xyz) > 0) & (depths(Rt2, xyz) > 0)
    keep = (
        mask
        & (e1 <= max_reprojection_error)
        & (e2 <= max_reprojection_error)
        & in_front
        & jnp.all(jnp.isfinite(xyz), axis=1)
    )
    return xyz, keep, e1, e2
