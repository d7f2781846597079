"""Batched PnP: DLT minimal solver + Gauss–Newton refinement + RANSAC.

TPU-native re-design of the reference's new-view registration:
cv::solvePnPRansac (100 iters, thr 10 px, conf 0.99) + Rodrigues writeback
(SfMToyLib/SfMStereoUtilities.cpp:208-243) and the legacy EPnP path with
its pose sanity gates (MultiCameraPnP.cpp:215-306). The minimal solver is
a 6-point DLT on Hartley-normalized 2D/3D; the winning hypothesis is
refined by a fixed-iteration Gauss–Newton on the reprojection residuals
(autodiff Jacobian, 6x6 normal equations) — all vmap/jit friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpusfm import camera
from tpusfm.geometry.linalg import (
    hartley_normalize_2d,
    hartley_normalize_3d,
    smallest_singular_vector,
)

_EPS = 1e-12


def pnp_dlt(X: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray | None = None):
    """Direct linear transform PnP from N>=6 3D->2D correspondences.

    X: (N,3) world points; x: (N,2) NORMALIZED camera coords (K removed);
    w: optional row weights for masked input. Returns (Rt (3,4), ok).
    """
    Xn, T3 = hartley_normalize_3d(X, w)
    xn, T2 = hartley_normalize_2d(x, w)
    XX, YY, ZZ = Xn[:, 0], Xn[:, 1], Xn[:, 2]
    u, v = xn[:, 0], xn[:, 1]
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    r1 = jnp.stack(
        [XX, YY, ZZ, one, zero, zero, zero, zero, -u * XX, -u * YY, -u * ZZ, -u],
        axis=1,
    )
    r2 = jnp.stack(
        [zero, zero, zero, zero, XX, YY, ZZ, one, -v * XX, -v * YY, -v * ZZ, -v],
        axis=1,
    )
    A = jnp.concatenate([r1, r2], axis=0)
    ww = None if w is None else jnp.concatenate([w, w], axis=0)
    p = smallest_singular_vector(A, ww)
    Pn = p.reshape(3, 4)
    # Denormalize: x = T2^-1 Pn T3 X
    P = jnp.linalg.inv(T2) @ Pn @ T3

    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, detUV], P.dtype)) @ Vt
    lam = jnp.mean(S) * detUV
    t = P[:, 3] / jnp.where(jnp.abs(lam) < _EPS, _EPS, lam)
    # Resolve the global sign so points end up in front of the camera
    if w is None:
        w = jnp.ones(X.shape[0], X.dtype)
    z = (X @ R.T + t)[:, 2]
    front = jnp.sum(jnp.where(z > 0, w, 0.0))
    behind = jnp.sum(jnp.where(z < 0, w, 0.0))
    flip = behind > front
    # Flipping lambda's sign flips t and requires R from -M
    Rf = U @ jnp.diag(jnp.array([1.0, 1.0, -detUV], P.dtype)) @ (-Vt)
    R = jnp.where(flip, Rf, R)
    t = jnp.where(flip, -t, t)
    ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t)) & (jnp.abs(lam) > _EPS)
    return camera.make_pose(R, t), ok


def _pose_residuals(params: jnp.ndarray, X: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Reprojection residuals in normalized coords. params=(rvec(3),t(3))."""
    rvec, t = params[:3], params[3:]
    pc = jax.vmap(lambda p: camera.rotate_angle_axis(rvec, p))(X) + t
    z = pc[:, 2:3]
    proj = pc[:, :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    return (proj - x).reshape(-1)


def refine_pose_gn(
    Rt: jnp.ndarray,
    X: jnp.ndarray,
    x: jnp.ndarray,
    w: jnp.ndarray,
    iterations: int = 10,
    damping: float = 1e-6,
) -> jnp.ndarray:
    """Gauss–Newton refinement of a pose on masked correspondences.

    x in normalized coords, w (N,) weights. Fixed iteration count (no
    data-dependent control flow) — equivalent in role to OpenCV's
    iterative refinement inside solvePnPRansac.
    """
    params0 = jnp.concatenate([camera.matrix_to_rodrigues(Rt[:, :3]), Rt[:, 3]])
    w2 = jnp.repeat(w, 2)

    def body(_, params):
        r = _pose_residuals(params, X, x)
        J = jax.jacfwd(_pose_residuals)(params, X, x)  # (2N, 6)
        Jw = J * w2[:, None]
        H = Jw.T @ J + damping * jnp.eye(6, dtype=J.dtype)
        g = Jw.T @ r
        step = jnp.linalg.solve(H, g)
        new = params - step
        return jnp.where(jnp.all(jnp.isfinite(new)), new, params)

    params = jax.lax.fori_loop(0, iterations, body, params0)
    R = camera.rodrigues_to_matrix(params[:3])
    return camera.make_pose(R, params[3:])


class PnPResult(NamedTuple):
    Rt: jnp.ndarray
    inliers: jnp.ndarray
    inlier_ratio: jnp.ndarray
    ok: jnp.ndarray


def find_camera_pose_2d3d(
    key,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    Kinv: jnp.ndarray,
    *,
    threshold_px: float = 10.0,
    hypotheses: int = 256,
    min_inlier_ratio: float = 0.5,
) -> PnPResult:
    """RANSAC PnP from 2D-3D matches (pixel coords).

    Equivalent of SfMStereoUtilities::findCameraPoseFrom2D3DMatch
    (SfMStereoUtilities.cpp:208-243) including the inlier-ratio >= 0.5
    acceptance gate (:231, SfMCommon.h:53).
    """
    from tpusfm.ransac import ransac

    x = camera.normalize_points(Kinv, uv)

    def solver(Xs, xs):
        # DLT init + Gauss-Newton polish on the minimal sample. The
        # algebraic DLT alone is weak under low depth relief (its median
        # reprojection error can be 100s of px on real far-field scenes
        # where an exact pose exists); OpenCV's SOLVEPNP_ITERATIVE — the
        # reference's solvePnPRansac backend (SfMStereoUtilities.cpp:216)
        # — refines every sample the same way.
        Rt0, ok = pnp_dlt(Xs, xs)
        w6 = jnp.ones(Xs.shape[0], Xs.dtype)
        Rt = refine_pose_gn(Rt0, Xs, xs, w6, iterations=8)
        bad = ~jnp.all(jnp.isfinite(Rt))
        return jnp.where(bad, Rt0, Rt), ok

    def scorer(Rt, Xs, xs):
        # pixel-space error: scale normalized residual by focal
        pc = camera.transform_points(Rt, Xs)
        z = pc[:, 2:3]
        proj = pc[:, :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
        f = jnp.array([K[0, 0], K[1, 1]], Rt.dtype)
        err = jnp.linalg.norm((proj - xs) * f, axis=1)
        return jnp.where(pc[:, 2] > 0, err, jnp.inf)

    def refit(Rt, w, Xs, xs):
        return refine_pose_gn(Rt, Xs, xs, w)

    Rt, inl, count = ransac(
        key, (X, x), mask,
        solver=lambda Xs, xs: solver(Xs, xs),
        scorer=scorer, refit=refit,
        sample_size=6, hypotheses=hypotheses, threshold=threshold_px,
    )
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    ratio = count / n_valid
    ok = ratio >= min_inlier_ratio
    return PnPResult(Rt=Rt, inliers=inl, inlier_ratio=ratio, ok=ok)
