"""Bundle-adjustment tests against the mock-camera fixtures.

Reimplements the intent of the reference's ceres_reprojection_test
(SfMUnitTests.cpp:153-189): the BA residual model must match the projection
model exactly; and BA must recover a perturbed reconstruction.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tests import fixtures
from tpusfm import camera
from tpusfm.ba import BAProblem, adjust_bundle, lm_solve, reprojection_rms
from tpusfm.ba.lm import _residual_one


def _build_problem(noise_cam=0.0, noise_pt=0.0, noise_f=0.0, seed=0, n_pts=60):
    intr = fixtures.intrinsics()
    pts = fixtures.dense_points(n_pts, seed=3)
    poses = [
        fixtures.mock_pose((5.0, 5.0, 5.0), (-1.0, 0.0, 1.0)),
        fixtures.mock_pose((-5.0, 0.0, 5.0), (1.0, 0.0, 0.8)),
        fixtures.mock_pose((0.0, -6.0, 2.0), (0.0, 0.5, 1.2)),
    ]
    V = len(poses)
    uv = jnp.stack([fixtures.project(p, pts, intr) for p in poses], axis=1)  # (N,V,2)
    mask = jnp.ones((n_pts, V), bool)

    rng = np.random.default_rng(seed)
    Rt = jnp.stack(poses)
    rvecs = camera.matrix_to_rodrigues_b(Rt[:, :, :3])
    cams = jnp.concatenate([rvecs, Rt[:, :, 3]], axis=1)
    cams = cams + noise_cam * jnp.asarray(rng.standard_normal(cams.shape), jnp.float32)
    pts_in = pts + noise_pt * jnp.asarray(rng.standard_normal(pts.shape), jnp.float32)
    pp = intr.pp
    prob = BAProblem(
        cams=cams,
        points=pts_in,
        focal=intr.focal + noise_f,
        uv=uv - pp[None, None, :],
        mask=mask,
        cam_valid=jnp.ones((V,), bool),
        pt_valid=jnp.ones((n_pts,), bool),
    )
    return prob, pts, Rt, intr


def test_residual_matches_projection():
    """BA residual == full projection model minus observation (the invariant
    the reference's ceres_reprojection_test pins to 0.1 px)."""
    intr = fixtures.intrinsics()
    pts = fixtures.canned_points()
    Rt = fixtures.mock_pose()
    uv = fixtures.project(Rt, pts, intr)
    cam6 = jnp.concatenate([camera.matrix_to_rodrigues(Rt[:, :3]), Rt[:, 3]])
    for i in range(pts.shape[0]):
        r = _residual_one(cam6, pts[i], intr.focal, uv[i] - intr.pp)
        assert float(jnp.max(jnp.abs(r))) < 0.1, f"point {i}: residual {r}"


def test_ba_zero_at_ground_truth():
    prob, *_ = _build_problem()
    assert float(reprojection_rms(prob)) < 1e-2


def test_ba_recovers_perturbation():
    prob, gt_pts, gt_Rt, intr = _build_problem(noise_cam=0.01, noise_pt=0.05)
    rms0 = float(reprojection_rms(prob))
    assert rms0 > 1.0, f"perturbation too small to be a real test: {rms0}"
    sol, summary = lm_solve(prob, max_iterations=50)
    rms1 = float(reprojection_rms(prob._replace(cams=sol.cams, points=sol.points, focal=sol.focal)))
    assert rms1 < 0.1, f"BA did not converge: rms {rms0} -> {rms1}"
    assert float(summary.final_cost) < float(summary.initial_cost) * 1e-3


def test_ba_recovers_focal():
    prob, *_ = _build_problem(noise_cam=0.002, noise_pt=0.01, noise_f=30.0)
    sol, _ = lm_solve(prob, max_iterations=60)
    assert abs(float(sol.focal) - fixtures.FOCAL) < 5.0, f"focal {float(sol.focal)}"


def test_adjust_bundle_api():
    """High-level API: raw pixel obs + poses in/out, K focal writeback."""
    prob, gt_pts, gt_Rt, intr = _build_problem(noise_cam=0.005, noise_pt=0.02)
    V, N = gt_Rt.shape[0], gt_pts.shape[0]
    R = camera.rodrigues_to_matrix_b(prob.cams[:, :3])
    Rt_in = jnp.concatenate([R, prob.cams[:, 3:, None]], axis=2)
    uv_raw = prob.uv + intr.pp[None, None, :]
    out_Rt, out_pts, outK, summary = adjust_bundle(
        Rt_in, prob.cam_valid, prob.points, prob.pt_valid, uv_raw,
        prob.mask, intr.K, max_iterations=50,
    )
    assert bool(summary.converged) or float(summary.final_cost) < float(summary.initial_cost) * 1e-3
    # reprojection with optimized state must be sub-0.1px
    errs = []
    for v in range(V):
        proj = camera.project_points(out_Rt[v], outK, out_pts)
        errs.append(np.linalg.norm(np.asarray(proj - uv_raw[:, v]), axis=1))
    assert float(np.mean(np.concatenate(errs))) < 0.1


def test_ba_masked_points_and_cams_stay_fixed():
    prob, *_ = _build_problem(noise_cam=0.01, noise_pt=0.05)
    pt_valid = prob.pt_valid.at[0].set(False)
    mask = prob.mask.at[:, 2].set(False)
    cam_valid = prob.cam_valid.at[2].set(False)
    p2 = prob._replace(pt_valid=pt_valid, cam_valid=cam_valid, mask=mask)
    sol, _ = lm_solve(p2, max_iterations=30)
    np.testing.assert_allclose(np.asarray(sol.points[0]), np.asarray(prob.points[0]))
    np.testing.assert_allclose(np.asarray(sol.cams[2]), np.asarray(prob.cams[2]))


def test_ba_refine_pp_recovers_principal_point():
    """refine_pp mode (legacy SSBA FULL_BUNDLE_FOCAL_LENGTH_PP,
    BundleAdjuster.cpp:219): BA recovers a principal point that was
    deliberately shifted by (6, -4) px in the initial K."""
    prob, pts, Rt, intr = _build_problem(n_pts=80)
    V = Rt.shape[0]
    shift = jnp.asarray([6.0, -4.0], jnp.float32)
    K_wrong = jnp.asarray(intr.K).at[:2, 2].add(shift)
    uv = prob.uv + intr.pp[None, None, :]  # back to raw pixels
    Rt_out, pts_out, K_out, summary = adjust_bundle(
        Rt, prob.cam_valid, prob.points, prob.pt_valid, uv, prob.mask,
        K_wrong, max_iterations=60, refine_pp=True)
    got_pp = np.asarray(K_out[:2, 2])
    np.testing.assert_allclose(got_pp, np.asarray(intr.pp), atol=0.5)
    # without refine_pp the wrong pp must stay put
    _, _, K_fixed, _ = adjust_bundle(
        Rt, prob.cam_valid, prob.points, prob.pt_valid, uv, prob.mask,
        K_wrong, max_iterations=10, refine_pp=False)
    np.testing.assert_allclose(np.asarray(K_fixed[:2, 2]), np.asarray(K_wrong[:2, 2]))
