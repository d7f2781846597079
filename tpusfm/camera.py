"""Batched camera / SE(3) math: Rodrigues, projection, composition.

Replaces the reference's cv::Rodrigues + cv::projectPoints usage
(SfMToyLib/SfMStereoUtilities.cpp:236-240, SfMUnitTests.cpp:88) and pins the
exact projection semantics of the Ceres BA residual
(SfMBundleAdjustmentUtils.cpp:58-97): rotate (angle-axis), translate, divide
by depth, scale by focal — principal point handled by the caller.

All functions are pure jnp, batched on the leading axis where noted, f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def rodrigues_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (3,) -> rotation matrix (3,3). Safe at theta=0."""
    theta2 = jnp.sum(rvec * rvec)
    theta = jnp.sqrt(theta2 + _EPS)
    k = rvec / theta
    K = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    # Near-zero fallback: first-order expansion I + [r]x
    Rsmall = jnp.eye(3) + jnp.array([
        [0.0, -rvec[2], rvec[1]],
        [rvec[2], 0.0, -rvec[0]],
        [-rvec[1], rvec[0], 0.0],
    ])
    return jnp.where(theta2 < 1e-16, Rsmall, R)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> unit quaternion (w,x,y,z), branchless.

    Computes all four Shepperd candidates and selects the best-conditioned
    one with a one-hot mask (XLA-friendly: no data-dependent branching).
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # Four candidates, each scaled by its own 4*q_i^2 = 1 + signed diag sum
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    cand = jnp.stack([
        jnp.array([qw2, m21 - m12, m02 - m20, m10 - m01]),
        jnp.array([m21 - m12, qx2, m01 + m10, m02 + m20]),
        jnp.array([m02 - m20, m01 + m10, qy2, m12 + m21]),
        jnp.array([m10 - m01, m02 + m20, m12 + m21, qz2]),
    ])  # (4, 4) rows: candidate pivots
    mags = jnp.stack([qw2, qx2, qy2, qz2])
    pick = jnp.argmax(mags)
    q = cand[pick]
    q = q / (jnp.linalg.norm(q) + _EPS)
    # Canonical sign: w >= 0
    return q * jnp.where(q[0] < 0, -1.0, 1.0)


def matrix_to_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> angle-axis (3,), robust near 0 and pi."""
    q = matrix_to_quaternion(R)
    w, v = q[0], q[1:]
    vnorm = jnp.linalg.norm(v)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(vnorm < 1e-9, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vnorm, _EPS))
    return v * scale


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential (3,) -> (3,3), autodiff-safe at w = 0.

    Unlike :func:`rodrigues_to_matrix` this never divides the axis vector
    by theta, so forward/reverse derivatives at the identity are exact and
    finite — required by the manifold Gauss-Newton refiners that linearize
    around w = 0 every iteration (geometry/essential.py).
    """
    th2 = jnp.sum(w * w)
    safe = th2 > 1e-12
    th = jnp.sqrt(jnp.where(safe, th2, 1.0))
    A = jnp.where(safe, jnp.sin(th) / th, 1.0 - th2 / 6.0)
    B = jnp.where(safe, (1.0 - jnp.cos(th)) / jnp.where(safe, th2, 1.0),
                  0.5 - th2 / 24.0)
    Wx = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    return jnp.eye(3, dtype=w.dtype) + A * Wx + B * (Wx @ Wx)


def rotate_angle_axis(rvec: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate point p (3,) by angle-axis rvec (3,) without forming R.

    Matches ceres::AngleAxisRotatePoint semantics used by the reference BA
    residual (SfMBundleAdjustmentUtils.cpp:66).
    """
    theta2 = jnp.sum(rvec * rvec)
    theta = jnp.sqrt(theta2 + _EPS)
    w = rvec / theta
    c, s = jnp.cos(theta), jnp.sin(theta)
    wxp = jnp.cross(w, p)
    wdp = jnp.dot(w, p)
    big = c * p + s * wxp + (1.0 - c) * wdp * w
    small = p + jnp.cross(rvec, p)
    return jnp.where(theta2 < 1e-16, small, big)


def euler_to_matrix(rx: float, ry: float, rz: float) -> jnp.ndarray:
    """XYZ Euler angles (radians) -> R = Rz @ Ry @ Rx.

    Matches the reference test fixture's Euler convention
    (SfMUnitTests.cpp:80-95 via cv::Rodrigues of composed rotations).
    """
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], jnp.float32)
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], jnp.float32)
    return Rz @ Ry @ Rx


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(3,3),(3,) -> 3x4 [R|t]."""
    return jnp.concatenate([R, t.reshape(3, 1)], axis=1)


def pose_R(Rt: jnp.ndarray) -> jnp.ndarray:
    return Rt[..., :3, :3]


def pose_t(Rt: jnp.ndarray) -> jnp.ndarray:
    return Rt[..., :3, 3]


def camera_center(Rt: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center c = -R^T t (batched on leading dims)."""
    R = pose_R(Rt)
    t = pose_t(Rt)
    return -jnp.einsum("...ji,...j->...i", R, t)


def transform_points(Rt: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """World -> camera coordinates. Rt (3,4), pts (N,3) -> (N,3)."""
    return pts @ pose_R(Rt).T + pose_t(Rt)


def project_points(Rt: jnp.ndarray, K: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Project world points (N,3) to pixels (N,2) with pose (3,4), K (3,3).

    Semantics identical to cv::projectPoints with zero distortion — the
    invariant pinned by the reference's ceres_reprojection_test
    (SfMUnitTests.cpp:153-189).
    """
    pc = transform_points(Rt, pts)
    z = pc[:, 2:3]
    xy = pc[:, :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    f = jnp.array([K[0, 0], K[1, 1]])
    pp = K[:2, 2]
    return xy * f + pp


def project_points_h(P: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Project with a full 3x4 projection matrix P (already includes K)."""
    ph = pts @ P[:, :3].T + P[:, 3]
    z = ph[:, 2:3]
    return ph[:, :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)


def normalize_points(Kinv: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords (N,2) -> normalized camera coords (N,2) via K^-1.

    Equivalent of cv::undistortPoints with zero distortion
    (SfMStereoUtilities.cpp:146-147).
    """
    xyh = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], axis=1)
    n = xyh @ Kinv.T
    return n[:, :2] / n[:, 2:3]


def distort_normalized(dist: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply the 5-coefficient Brown model (k1 k2 p1 p2 k3) to normalized
    camera coords (N,2) — cv::projectPoints' distortion convention."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[:, 0], xy[:, 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=1)


def undistort_points(K: jnp.ndarray, Kinv: jnp.ndarray, dist: jnp.ndarray,
                     uv: jnp.ndarray, iterations: int = 8) -> jnp.ndarray:
    """Undistort pixel coords (N,2) -> ideal pixel coords (N,2).

    The role of cv::undistortPoints in the reference's triangulation
    (SfMStereoUtilities.cpp:146-147) and of the calibrated legacy path
    (MultiCameraDistance.cpp:78-89): fixed-point iteration of the inverse
    Brown model in normalized coordinates, then re-projection through K.
    With zero coefficients this is the identity, so the pipeline applies
    it unconditionally right after feature extraction and every
    downstream stage stays pinhole.
    """
    xyn = normalize_points(Kinv, uv)

    def body(_, x):
        d = distort_normalized(dist, x)
        return x - (d - xyn)

    x = jax.lax.fori_loop(0, iterations, body, xyn)
    f = jnp.array([K[0, 0], K[1, 1]])
    return x * f + K[:2, 2]


def relative_pose(Rt_a: jnp.ndarray, Rt_b: jnp.ndarray) -> jnp.ndarray:
    """Pose of camera b relative to camera a: x_b = R_rel x_a + t_rel."""
    Ra, ta = pose_R(Rt_a), pose_t(Rt_a)
    Rb, tb = pose_R(Rt_b), pose_t(Rt_b)
    Rrel = Rb @ Ra.T
    trel = tb - Rrel @ ta
    return make_pose(Rrel, trel)


# Batched variants
rodrigues_to_matrix_b = jax.vmap(rodrigues_to_matrix)
matrix_to_rodrigues_b = jax.vmap(matrix_to_rodrigues)
project_points_b = jax.vmap(project_points, in_axes=(0, None, None))
