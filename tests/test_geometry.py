"""Geometry solver tests against the synthetic mock-camera fixtures,
mirroring the reference's unit tests (SfMUnitTests.cpp:194-251:
find_camera_pose_from_2d3d_match, triangulate_from_2_views) plus
RANSAC-with-outliers coverage the reference lacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusfm import camera
from tpusfm.geometry import (
    homography_dlt,
    homography_transfer_error,
    essential_8pt,
    sampson_error,
    decompose_essential_hz,
    decompose_essential_horn90,
    pick_pose_by_cheirality,
    triangulate_dlt,
    triangulate_hartley_sturm,
    triangulate_views,
    pnp_dlt,
    refine_pose_gn,
    find_camera_from_match,
    find_camera_pose_2d3d,
)
from tests import fixtures


def stereo_setup(n=100, noise=0.0, seed=0):
    intr = fixtures.intrinsics()
    pts = fixtures.dense_points(n, seed)
    p1, p2 = fixtures.stereo_poses()
    uv1 = fixtures.project(p1, pts)
    uv2 = fixtures.project(p2, pts)
    if noise > 0:
        rng = np.random.default_rng(seed + 1)
        uv1 = uv1 + rng.normal(0, noise, uv1.shape).astype(np.float32)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape).astype(np.float32)
    return intr, pts, p1, p2, jnp.asarray(uv1), jnp.asarray(uv2)


def relpose(p1, p2):
    return camera.relative_pose(p1, p2)


def rot_err(Ra, Rb):
    return float(np.abs(np.asarray(Ra) - np.asarray(Rb)).max())


def t_dir_err(ta, tb):
    ta = np.asarray(ta) / np.linalg.norm(ta)
    tb = np.asarray(tb) / np.linalg.norm(tb)
    return min(np.abs(ta - tb).max(), np.abs(ta + tb).max())


# ---------------- homography ----------------

def test_homography_dlt_exact():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]], np.float32)
    x1 = rng.uniform(0, 1000, (50, 2)).astype(np.float32)
    xh = np.concatenate([x1, np.ones((50, 1), np.float32)], axis=1) @ H_true.T
    x2 = xh[:, :2] / xh[:, 2:3]
    H = homography_dlt(jnp.asarray(x1), jnp.asarray(x2))
    err = homography_transfer_error(H, jnp.asarray(x1), jnp.asarray(x2))
    assert float(jnp.max(err)) < 0.5


def test_homography_weighted_ignores_outliers():
    rng = np.random.default_rng(1)
    H_true = np.array([[1.0, 0.0, 10.0], [0.0, 1.0, -5.0], [0.0, 0.0, 1.0]], np.float32)
    x1 = rng.uniform(0, 1000, (60, 2)).astype(np.float32)
    x2 = x1 + np.array([10.0, -5.0], np.float32)
    x2[:10] += rng.uniform(50, 100, (10, 2)).astype(np.float32)  # corrupt
    w = np.ones(60, np.float32)
    w[:10] = 0.0
    H = homography_dlt(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w))
    err = homography_transfer_error(H, jnp.asarray(x1[10:]), jnp.asarray(x2[10:]))
    assert float(jnp.max(err)) < 0.5


# ---------------- essential ----------------

def test_essential_8pt_and_decompose():
    intr, pts, p1, p2, uv1, uv2 = stereo_setup(100)
    x1 = camera.normalize_points(intr.Kinv, uv1)
    x2 = camera.normalize_points(intr.Kinv, uv2)
    E = essential_8pt(x1, x2)
    err = sampson_error(E, x1, x2)
    assert float(jnp.max(err)) < 1e-3

    rel = relpose(p1, p2)
    mask = jnp.ones(x1.shape[0], bool)
    for decomp in (decompose_essential_hz, decompose_essential_horn90):
        cands = decomp(E)
        Rt, front, _, _ = pick_pose_by_cheirality(cands, x1, x2, mask)
        assert rot_err(Rt[:, :3], rel[:, :3]) < 5e-2, decomp.__name__
        assert t_dir_err(Rt[:, 3], rel[:, 3]) < 5e-2, decomp.__name__
        assert int(jnp.sum(front)) > 90


def test_find_camera_from_match_with_outliers():
    intr, pts, p1, p2, uv1, uv2 = stereo_setup(200, noise=0.5)
    rng = np.random.default_rng(7)
    uv2 = np.array(uv2)
    uv2[:40] = rng.uniform(0, 1000, (40, 2))  # 20% outliers
    mask = jnp.ones(200, bool)
    res = find_camera_from_match(
        jax.random.PRNGKey(0), uv1, jnp.asarray(uv2), mask, intr.K, intr.Kinv,
        threshold_px=2.0, hypotheses=512,
    )
    rel = relpose(p1, p2)
    assert bool(res.ok)
    assert rot_err(res.Rt[:, :3], rel[:, :3]) < 5e-2
    assert t_dir_err(res.Rt[:, 3], rel[:, 3]) < 5e-2
    inl = np.asarray(res.inliers)
    assert inl[40:].mean() > 0.9      # keeps true matches
    assert inl[:40].mean() < 0.1      # rejects outliers


# ---------------- triangulation ----------------

def test_triangulate_from_2_views():
    """Reference tolerance: points within 0.01 of ground truth
    (SfMUnitTests.cpp:247-250)."""
    intr, pts, p1, p2, uv1, uv2 = stereo_setup(100)
    x1 = camera.normalize_points(intr.Kinv, uv1)
    x2 = camera.normalize_points(intr.Kinv, uv2)
    for fn in (triangulate_dlt, triangulate_hartley_sturm):
        xyz = fn(p1, p2, x1, x2)
        np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts), atol=0.01)


def test_triangulate_views_gates():
    intr, pts, p1, p2, uv1, uv2 = stereo_setup(100)
    uv2 = np.array(uv2)
    uv2[:5] += 50.0  # corrupt -> should fail the 10px dual-view gate
    mask = jnp.ones(100, bool)
    xyz, keep, e1, e2 = triangulate_views(
        p1, p2, intr.K, intr.Kinv, uv1, jnp.asarray(uv2), mask,
        max_reprojection_error=10.0,
    )
    keep = np.asarray(keep)
    assert keep[:5].sum() == 0
    assert keep[5:].all()
    np.testing.assert_allclose(np.asarray(xyz)[5:], np.asarray(pts)[5:], atol=0.02)


# ---------------- pnp ----------------

def test_pnp_dlt_exact():
    intr = fixtures.intrinsics()
    pts = fixtures.dense_points(60)
    Rt_true = fixtures.mock_pose((5.0, 5.0, 5.0), (-1.0, 0.0, 1.0))
    uv = fixtures.project(Rt_true, pts)
    x = camera.normalize_points(intr.Kinv, uv)
    Rt, ok = pnp_dlt(pts, x)
    assert bool(ok)
    assert rot_err(Rt[:, :3], Rt_true[:, :3]) < 1e-2
    np.testing.assert_allclose(np.asarray(Rt[:, 3]), np.asarray(Rt_true[:, 3]), atol=0.1)


def test_find_camera_pose_2d3d():
    """Reference tolerance: R within 0.01, t within 0.1
    (SfMUnitTests.cpp:210-215) — plus 25% outliers."""
    intr = fixtures.intrinsics()
    pts = fixtures.dense_points(120)
    Rt_true = fixtures.mock_pose((5.0, 5.0, 5.0), (-1.0, 0.0, 1.0))
    uv = np.array(fixtures.project(Rt_true, pts))
    rng = np.random.default_rng(3)
    uv[:30] = rng.uniform(0, 1200, (30, 2))
    res = find_camera_pose_2d3d(
        jax.random.PRNGKey(1), pts, jnp.asarray(uv.astype(np.float32)),
        jnp.ones(120, bool), intr.K, intr.Kinv,
        threshold_px=10.0, hypotheses=256,
    )
    assert bool(res.ok)
    assert rot_err(res.Rt[:, :3], Rt_true[:, :3]) < 0.01
    np.testing.assert_allclose(np.asarray(res.Rt[:, 3]), np.asarray(Rt_true[:, 3]), atol=0.1)
    assert np.asarray(res.inliers)[:30].mean() < 0.1


def test_refine_pose_gn_improves():
    intr = fixtures.intrinsics()
    pts = fixtures.dense_points(80)
    Rt_true = fixtures.mock_pose((5.0, 5.0, 5.0), (-1.0, 0.0, 1.0))
    uv = fixtures.project(Rt_true, pts)
    x = camera.normalize_points(intr.Kinv, uv)
    # perturb the pose
    Rp = camera.rodrigues_to_matrix(jnp.array([0.02, -0.01, 0.015]))
    Rt0 = camera.make_pose(Rp @ Rt_true[:, :3], Rt_true[:, 3] + 0.1)
    Rt = refine_pose_gn(Rt0, pts, x, jnp.ones(80))
    assert rot_err(Rt[:, :3], Rt_true[:, :3]) < 1e-3
    np.testing.assert_allclose(np.asarray(Rt[:, 3]), np.asarray(Rt_true[:, 3]), atol=1e-2)
