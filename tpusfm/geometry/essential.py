"""Batched essential-matrix estimation and decomposition.

TPU-native re-design of the reference's epipolar core:
- cv::findEssentialMat RANSAC + cv::recoverPose
  (SfMToyLib/SfMStereoUtilities.cpp:74-118)
- legacy GetFundamentalMat / DecomposeEtoRandT (HZ SVD, W-matrix)
  (legacy/SfMToyLib_Old/FindCameraMatrices.cpp:144-363)
- legacy Horn'90 closed-form decomposition
  (FindCameraMatrices.cpp:51-111, selected by #define DECOMPOSE_SVD)

Estimation is the normalized 8-point algorithm as a weighted masked DLT
(doubles as minimal solver and all-inlier refit); model selection is
batched-hypothesis RANSAC with Sampson scoring; cheirality disambiguation
triangulates all 4 candidate poses at once (vmap) and picks the pose with
the most points in front of both cameras (equivalent of the legacy
TestTriangulation >=75% gate, FindCameraMatrices.cpp:277-326).

Convention: x2^T E x1 = 0 with E = [t]x R and x_2cam = R x_1cam + t.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpusfm import camera
from tpusfm.geometry.linalg import (
    hartley_normalize_2d,
    skew,
    smallest_singular_vector_direct,
)
from tpusfm.geometry import triangulation as tri

_EPS = 1e-12


def _epipolar_rows(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Rows of the 8-point system for x2^T E x1 = 0. (N,2)x(N,2)->(N,9)."""
    u, v = x1[:, 0], x1[:, 1]
    up, vp = x2[:, 0], x2[:, 1]
    one = jnp.ones_like(u)
    return jnp.stack(
        [up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=1
    )


def essential_8pt(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point essential matrix from N>=8 normalized-coord
    correspondences. Weighted rows support masked refits. Enforces the
    essential constraint via SVD -> diag(1,1,0) projection."""
    n1, T1 = hartley_normalize_2d(x1, w)
    n2, T2 = hartley_normalize_2d(x2, w)
    A = _epipolar_rows(n1, n2)
    # direct SVD, not Gram/eigh: in f32 the Gram path's squared conditioning
    # costs ~half the significand — fatal at full-res pixel thresholds
    f = smallest_singular_vector_direct(A, w)
    F = f.reshape(3, 3)
    F = T2.T @ F @ T1
    U, S, Vt = jnp.linalg.svd(F)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], F.dtype)) @ Vt
    return E / jnp.maximum(jnp.linalg.norm(E), _EPS)


def _sampson_signed(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Signed first-order Sampson residual (N,) — the GN refiner's residual."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=1)
    Ex1 = x1h @ E.T
    Etx2 = x2h @ E
    num = jnp.sum(x2h * Ex1, axis=1)
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, _EPS))


def refine_essential(
    E0: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    w: jnp.ndarray,
    *,
    iters: int = 8,
) -> jnp.ndarray:
    """Levenberg-Marquardt on weighted Sampson error over the essential
    manifold: E = [t]x R, 5 dof (R in SO(3), t on the unit sphere).

    This is the step the reference gets implicitly from cv::findEssentialMat's
    5-point minimal solver (SfMStereoUtilities.cpp:97): a model that is
    geometrically optimal *within* the essential manifold. A linear 8-point
    fit followed by the diag(1,1,0) projection is NOT — with a guessed
    focal (SfM.cpp:70-74 hardcodes f=2500) the projection alone can move
    the model several pixels, collapsing the inlier set at a 1 px gate.
    Measured on crazyhorse full-res matches: 8pt+projection scores 0-9%
    inliers where cv2's 5-point scores ~76-80%; this refiner reaches
    74-82% from the same 8pt init.

    w: (N,) float weights (0 = ignore). Returns the refined E (unit norm);
    falls back to E0 when fewer than 8 points carry weight.
    """
    cands = decompose_essential_hz(E0)
    Rt, _, _, _ = pick_pose_by_cheirality(cands, x1, x2, w > 0)
    R, t = Rt[:, :3], Rt[:, 3]
    t = t / jnp.maximum(jnp.linalg.norm(t), _EPS)

    def retract(theta, R, t):
        Rn = camera.exp_so3(theta[:3]) @ R
        dt = theta[3:]
        tn = t + dt - t * jnp.dot(t, dt)      # project step to tangent of S^2
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), _EPS)
        return Rn, tn

    def resid(theta, R, t):
        Rn, tn = retract(theta, R, t)
        return _sampson_signed(skew(tn) @ Rn, x1, x2) * w

    def body(carry, _):
        R, t, lam = carry
        z = jnp.zeros(6, dtype=x1.dtype)
        r = resid(z, R, t)
        J = jax.jacfwd(resid)(z, R, t)                      # (N, 6)
        H = J.T @ J + lam * jnp.eye(6, dtype=x1.dtype)
        step = -jnp.linalg.solve(H, J.T @ r)
        r_new = resid(step, R, t)
        better = (jnp.sum(r_new * r_new) < jnp.sum(r * r)) & jnp.all(jnp.isfinite(step))
        lam = jnp.where(better, lam * 0.3, lam * 10.0)
        theta = jnp.where(better, step, jnp.zeros(6, dtype=x1.dtype))
        R, t = retract(theta, R, t)
        return (R, t, lam), None

    (R, t, _), _ = jax.lax.scan(body, (R, t, jnp.asarray(1e-3, x1.dtype)), None,
                                length=iters)
    E = skew(t) @ R
    E = E / jnp.maximum(jnp.linalg.norm(E), _EPS)
    ok = (jnp.sum(w > 0) >= 8) & jnp.all(jnp.isfinite(E))
    return jnp.where(ok, E, E0)


def sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) epipolar distance, (N,).

    In normalized camera coordinates; multiply pixel thresholds by 1/f to
    compare (the reference's 1.0 px findEssentialMat threshold,
    SfMStereoUtilities.cpp:97, becomes 1.0/f here).
    """
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=1)
    Ex1 = x1h @ E.T          # (N,3)
    Etx2 = x2h @ E           # (N,3)
    num = jnp.sum(x2h * Ex1, axis=1)
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return jnp.abs(num) / jnp.sqrt(jnp.maximum(den, _EPS))


def essential_from_poses(Rt1: jnp.ndarray, Rt2: jnp.ndarray) -> jnp.ndarray:
    """E for a view pair from KNOWN world->camera poses: E = [t_rel]x R_rel.

    Used by the fused engine's add-view match pruning: once both poses are
    registered (and BA-refined), the epipolar geometry is determined — no
    RANSAC re-estimation needed, unlike the reference's per-pair
    findCameraMatricesFromMatch re-run (SfM.cpp:442-448), which must
    re-estimate because it never trusts its poses. Sampson-gating against
    this E is the same filter at ~1/500th the device cost.
    """
    rel = camera.relative_pose(Rt1, Rt2)
    E = skew(rel[:, 3]) @ rel[:, :3]
    return E / jnp.maximum(jnp.linalg.norm(E), _EPS)


def decompose_essential_hz(E: jnp.ndarray) -> jnp.ndarray:
    """HZ 9.13/9.19 SVD decomposition -> 4 candidate poses (4,3,4).

    Equivalent of legacy DecomposeEtoRandT (FindCameraMatrices.cpp:328-363)
    including the det(R) = -1 sign flip (:416-421).
    """
    U, S, Vt = jnp.linalg.svd(E)
    # keep proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return jnp.stack([
        camera.make_pose(R1, t),
        camera.make_pose(R1, -t),
        camera.make_pose(R2, t),
        camera.make_pose(R2, -t),
    ])


def _cofactor(E: jnp.ndarray) -> jnp.ndarray:
    """Cofactor matrix of a 3x3 (rows of cross products of E's rows)."""
    r0, r1, r2 = E[0], E[1], E[2]
    return jnp.stack([
        jnp.cross(r1, r2),
        jnp.cross(r2, r0),
        jnp.cross(r0, r1),
    ])


def decompose_essential_horn90(E: jnp.ndarray) -> jnp.ndarray:
    """Horn'90 closed-form decomposition -> 4 candidate poses (4,3,4).

    Re-derivation of the legacy Eigen implementation
    (FindCameraMatrices.cpp:51-111, eqs 12/19/24 of Horn 1990):
    bb^T = 1/2 tr(EE^T) I - EE^T gives the baseline; the rotation is
    R = (cof(E) - [b]x E) / (b.b); the twisted pair comes from -E.
    Rotations are re-projected to SO(3) (polar via SVD) for noise
    robustness. No SVD of E itself is required (cheap on TPU).
    """
    EEt = E @ E.T
    M = 0.5 * jnp.trace(EEt) * jnp.eye(3, dtype=E.dtype) - EEt  # = b b^T
    d = jnp.diag(M)
    i = jnp.argmax(d)
    b = M[i] / jnp.sqrt(jnp.maximum(d[i], _EPS))
    btb = jnp.maximum(jnp.dot(b, b), _EPS)
    cof = _cofactor(E)
    B = skew(b)

    def orthonormalize(R):
        U, _, Vt = jnp.linalg.svd(R)
        Rp = U @ Vt
        return Rp * jnp.sign(jnp.linalg.det(Rp))

    Ra = orthonormalize((cof - B @ E) / btb)    # from (E, b)
    Rb = orthonormalize((cof + B @ E) / btb)    # from (-E, b): twisted pair
    return jnp.stack([
        camera.make_pose(Ra, b),
        camera.make_pose(Ra, -b),
        camera.make_pose(Rb, b),
        camera.make_pose(Rb, -b),
    ])


def epipolar_inliers(
    key,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    Kinv: jnp.ndarray,
    *,
    threshold_px: float = 3.0,
    hypotheses: int = 256,
) -> jnp.ndarray:
    """Epipolar-consistency mask for one matched pair (no pose recovery).

    TPU equivalent of the legacy global F-matrix match-pruning pass
    (MultiCameraPnP::PruneMatchesBasedOnF, MultiCameraPnP.cpp:463-485,
    GetFundamentalMat RANSAC @ FindCameraMatrices.cpp:144-246): estimate E
    by batched-hypothesis RANSAC and keep only Sampson-consistent matches.
    """
    from tpusfm.ransac import ransac

    x1 = camera.normalize_points(Kinv, uv1)
    x2 = camera.normalize_points(Kinv, uv2)
    f = 0.5 * (K[0, 0] + K[1, 1])
    thr = threshold_px / f

    def solver(p1, p2):
        E = essential_8pt(p1, p2)
        return E, jnp.all(jnp.isfinite(E))

    def scorer(E, p1, p2):
        return sampson_error(E, p1, p2)

    def refit(E, w, p1, p2):
        # fewer GN iters than the pose path: the prune gate is 3x laxer
        # and this kernel is batched over every pair (compile size)
        return refine_essential(essential_8pt(p1, p2, w), p1, p2, w, iters=4)

    _, inl, _ = ransac(
        key, (x1, x2), mask,
        solver=solver, scorer=scorer, refit=refit,
        sample_size=8, hypotheses=hypotheses, threshold=thr,
        lo_multipliers=(8.0, 2.0, 1.0),
        lo_candidates=1,
    )
    return inl & mask


class TwoViewResult(NamedTuple):
    Rt: jnp.ndarray            # (3,4) pose of view2 relative to view1
    E: jnp.ndarray             # (3,3)
    inliers: jnp.ndarray       # (N,) bool — epipolar+cheirality pruned matches
    inlier_ratio: jnp.ndarray  # scalar — pose inliers / valid matches
    ok: jnp.ndarray            # scalar bool


def pick_pose_by_cheirality(candidates: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, mask: jnp.ndarray):
    """Disambiguate the 4 candidate poses by triangulating all of them.

    Batched equivalent of the legacy 4-candidate loop
    (FindCameraMatrices.cpp:428-480): for each candidate, triangulate and
    count points in front of both cameras; pick the argmax.
    Returns (Rt (3,4), front_mask (N,), front_frac, mean_reproj) for the
    winner, where front_frac is the in-front fraction over valid matches
    and mean_reproj the mean reprojection error (normalized units) of the
    in-front points — the inputs to the legacy acceptance gates
    (TestTriangulation >=75 % @ FindCameraMatrices.cpp:277-326 and
    reprojection < 100 px @ :465-470), applied by the caller.
    """
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def front(Rt):
        xyz = tri.triangulate_dlt(P1, Rt, x1, x2)
        z1 = xyz[:, 2]
        z2 = camera.transform_points(Rt, xyz)[:, 2]
        good = (z1 > 0) & (z2 > 0) & mask & jnp.all(jnp.isfinite(xyz), axis=1)
        # reprojection error in both views (normalized coords), masked mean
        p1 = xyz[:, :2] / jnp.where(jnp.abs(z1[:, None]) < _EPS, _EPS, z1[:, None])
        pc2 = camera.transform_points(Rt, xyz)
        p2 = pc2[:, :2] / jnp.where(jnp.abs(pc2[:, 2:]) < _EPS, _EPS, pc2[:, 2:])
        e = 0.5 * (jnp.linalg.norm(p1 - x1, axis=1) + jnp.linalg.norm(p2 - x2, axis=1))
        w = good.astype(e.dtype)
        mean_e = jnp.sum(jnp.where(good, e, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)
        return good, mean_e

    fronts, errs = jax.vmap(front)(candidates)     # (4, N), (4,)
    counts = jnp.sum(fronts, axis=1)
    best = jnp.argmax(counts)
    frac = counts[best] / jnp.maximum(jnp.sum(mask), 1)
    return candidates[best], fronts[best], frac, errs[best]


def find_camera_from_match(
    key,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    Kinv: jnp.ndarray,
    *,
    threshold_px: float = 1.0,
    hypotheses: int = 512,
    use_horn: bool = False,
    min_front_frac: float = 0.0,
    max_front_reproj_px: float = 0.0,
) -> TwoViewResult:
    """Full two-view relative-pose recovery from matched pixel coords.

    Equivalent of SfMStereoUtilities::findCameraMatricesFromMatch
    (SfMStereoUtilities.cpp:74-118): essential RANSAC + pose recovery +
    match pruning by the surviving-inlier mask (:110-115). The pose-inlier
    ratio output feeds the caller's >=0.5 gate (SfM.cpp:264-275,
    POSE_INLIERS_MINIMAL_RATIO @ SfMCommon.h:53).

    min_front_frac / max_front_reproj_px (both off when 0) enable the
    legacy cheirality acceptance gates: >= min_front_frac of the epipolar
    inliers must triangulate in front of both cameras
    (TestTriangulation, FindCameraMatrices.cpp:277-326) and their mean
    reprojection error must stay under max_front_reproj_px pixels
    (:465-470, reference constant 100.0) — otherwise ok=False.
    """
    from tpusfm.ransac import ransac

    x1 = camera.normalize_points(Kinv, uv1)
    x2 = camera.normalize_points(Kinv, uv2)
    f = 0.5 * (K[0, 0] + K[1, 1])
    thr = threshold_px / f

    def solver(p1, p2):
        E = essential_8pt(p1, p2)
        return E, jnp.all(jnp.isfinite(E))

    def scorer(E, p1, p2):
        return sampson_error(E, p1, p2)

    def refit(E, w, p1, p2):
        return refine_essential(essential_8pt(p1, p2, w), p1, p2, w)

    E, epi_inl, _ = ransac(
        key, (x1, x2), mask,
        solver=solver, scorer=scorer, refit=refit,
        sample_size=8, hypotheses=hypotheses, threshold=thr,
        lo_multipliers=(16.0, 8.0, 4.0, 2.0, 1.0, 1.0),
        lo_candidates=8,
    )
    decompose = decompose_essential_horn90 if use_horn else decompose_essential_hz
    candidates = decompose(E)
    Rt, front, frac, front_err = pick_pose_by_cheirality(candidates, x1, x2, epi_inl)
    inliers = epi_inl & front
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    ratio = jnp.sum(inliers) / n_valid
    ok = jnp.isfinite(ratio) & (jnp.sum(inliers) >= 8)
    if min_front_frac > 0.0:
        ok = ok & (frac >= min_front_frac)
    if max_front_reproj_px > 0.0:
        ok = ok & (front_err * f < max_front_reproj_px)
    return TwoViewResult(Rt=Rt, E=E, inliers=inliers, inlier_ratio=ratio, ok=ok)
