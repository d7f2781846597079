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


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse via adjugate (no factorization kernels)."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A11 = e * i - f * h
    A21 = f * g - d * i
    A31 = d * h - e * g
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.array([
        [A11, c * h - b * i, b * f - c * e],
        [A21, a * i - c * g, c * d - a * f],
        [A31, b * g - a * h, a * e - b * d],
    ])
    return adj / det


def _solve_homogeneous_4(A: jnp.ndarray) -> jnp.ndarray:
    """Triangulation solve for A (k,4) rows [a | b]: A[:, :3] X = -A[:, 3].

    Inhomogeneous least squares with fixed w=1 — the same formulation the
    legacy reference uses (LinearLSTriangulation's 4x3 DECOMP_SVD solve,
    Triangulation.cpp:66-77). The 3x3 normal equations invert in closed
    form: pure arithmetic, no eigh/SVD emulation in the inner loop (this
    runs tens of thousands of times per reconstruction round)."""
    M = A[:, :3]
    b = -A[:, 3]
    G = M.T @ M + 1e-12 * jnp.eye(3, dtype=A.dtype)
    return _inv3x3(G) @ (M.T @ b)


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
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Iterative linear-LS triangulation (Hartley & Sturm reweighting).

    Re-designs legacy IterativeLinearLSTriangulation
    (Triangulation.cpp:87-123): rows are reweighted by the inverse
    projective depth w = p3^T X of each view and re-solved, up to
    ``iterations`` times. The legacy early-break at |w - w_prev| < eps
    (Triangulation.h:52's EPSILON) becomes a per-point converged mask —
    the loop stays a fixed-trip fused XLA loop, converged points simply
    stop updating (bit-stable results, no data-dependent trip counts).
    """

    def one(a, b):
        def body(_, carry):
            X, w1p, w2p, done = carry
            Xh = jnp.concatenate([X, jnp.ones((1,), X.dtype)])
            w1 = jnp.maximum(jnp.abs(P1[2] @ Xh), _EPS)
            w2 = jnp.maximum(jnp.abs(P2[2] @ Xh), _EPS)
            conv = (jnp.abs(w1 - w1p) <= eps) & (jnp.abs(w2 - w2p) <= eps)
            A = jnp.concatenate(
                [_dlt_rows(P1, a) / w1, _dlt_rows(P2, b) / w2], axis=0
            )
            Xn = _solve_homogeneous_4(A)
            X = jnp.where(done, X, Xn)
            return (X, w1, w2, done | conv)

        X0 = _solve_homogeneous_4(
            jnp.concatenate([_dlt_rows(P1, a), _dlt_rows(P2, b)], axis=0)
        )
        init = (X0, jnp.ones((), X0.dtype), jnp.ones((), X0.dtype),
                jnp.zeros((), bool))
        X, _, _, _ = jax.lax.fori_loop(0, iterations, body, init)
        return X

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
    eps: float = 1e-4,
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
    xyz = triangulate_hartley_sturm(Rt1, Rt2, x1, x2, iterations, eps)
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
