"""Camera math tests, cross-validated against OpenCV (cv2 is used ONLY as a
test oracle — mirroring how the reference's ceres_reprojection_test
cross-validates its residual model against cv::projectPoints,
SfMUnitTests.cpp:153-189). The compute path is pure JAX."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpusfm import camera
from tests import fixtures

cv2 = pytest.importorskip("cv2")


def random_rvecs(n=50, seed=3):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, np.pi - 1e-3, size=(n, 1))
    rv = axes * angles
    rv[0] = 0.0  # identity
    rv[1] = [1e-8, 0, 0]  # tiny
    rv[2] = [np.pi - 1e-5, 0, 0]  # near pi
    return rv.astype(np.float32)


def test_rodrigues_roundtrip_vs_cv2():
    for rv in random_rvecs():
        R_ours = np.asarray(camera.rodrigues_to_matrix(jnp.asarray(rv)))
        R_cv, _ = cv2.Rodrigues(rv.reshape(3, 1))
        np.testing.assert_allclose(R_ours, R_cv, atol=1e-5)
        rv_back = np.asarray(camera.matrix_to_rodrigues(jnp.asarray(R_ours)))
        R_back = np.asarray(camera.rodrigues_to_matrix(jnp.asarray(rv_back)))
        # f32 near-pi roundtrip loses ~1e-3; rotations near pi are rare in SfM
        np.testing.assert_allclose(R_back, R_ours, atol=2e-3)


def test_rotate_angle_axis_matches_matrix():
    rng = np.random.default_rng(0)
    for rv in random_rvecs(10):
        p = rng.normal(size=3).astype(np.float32)
        R = camera.rodrigues_to_matrix(jnp.asarray(rv))
        got = np.asarray(camera.rotate_angle_axis(jnp.asarray(rv), jnp.asarray(p)))
        want = np.asarray(R @ p)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_projection_vs_cv2():
    """The reference's key invariant: our projection == cv::projectPoints
    within 0.1 px (SfMUnitTests.cpp:186-187)."""
    intr = fixtures.intrinsics()
    pts = np.asarray(fixtures.canned_points(), np.float64)
    Rt = fixtures.mock_pose()
    R = np.asarray(Rt[:, :3], np.float64)
    t = np.asarray(Rt[:, 3], np.float64)
    rvec, _ = cv2.Rodrigues(R)
    K = np.asarray(intr.K, np.float64)
    cv_proj, _ = cv2.projectPoints(pts, rvec, t.reshape(3, 1), K, None)
    ours = np.asarray(fixtures.project(Rt, jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(ours, cv_proj.reshape(-1, 2), atol=0.1)


def test_camera_center():
    Rt = fixtures.mock_pose()
    c = camera.camera_center(Rt)
    # transforming the center must give the origin in camera coords
    out = camera.transform_points(Rt, c.reshape(1, 3))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_normalize_points_inverts_K():
    intr = fixtures.intrinsics()
    pts = fixtures.canned_points()
    uv = fixtures.project(fixtures.mock_pose(), pts)
    norm = camera.normalize_points(intr.Kinv, uv)
    # re-applying K must give back pixels
    back = norm * intr.focal + intr.pp
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-3)


def test_relative_pose():
    p1, p2 = fixtures.stereo_poses()
    rel = camera.relative_pose(p1, p2)
    pts = fixtures.canned_points()
    x1 = camera.transform_points(p1, pts)
    x2a = camera.transform_points(p2, pts)
    x2b = camera.transform_points(rel, x1)
    np.testing.assert_allclose(np.asarray(x2a), np.asarray(x2b), atol=1e-4)


def test_undistort_points_roundtrip():
    """undistort_points inverts the Brown model to sub-0.01px (the wiring
    for calibrated datasets, MultiCameraDistance.cpp:78-89 /
    SfMStereoUtilities.cpp:146-147)."""
    import numpy as np

    from tpusfm import camera as cam
    from tpusfm.types import Intrinsics

    rng = np.random.default_rng(0)
    intr = Intrinsics.create(800.0, 320.0, 240.0,
                             dist=[-0.28, 0.08, 1e-3, -5e-4, 0.0])
    xyn = jnp.asarray(rng.uniform(-0.3, 0.3, (64, 2)).astype(np.float32))
    ideal_px = xyn * 800.0 + jnp.array([320.0, 240.0])
    dist_px = cam.distort_normalized(intr.dist, xyn) * 800.0 + jnp.array([320.0, 240.0])
    rec = cam.undistort_points(intr.K, intr.Kinv, intr.dist, dist_px)
    assert float(jnp.abs(rec - ideal_px).max()) < 0.01


def test_undistort_points_identity_when_zero():
    import numpy as np

    from tpusfm import camera as cam
    from tpusfm.types import Intrinsics

    intr = Intrinsics.create(800.0, 320.0, 240.0)
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 640, (32, 2)).astype(np.float32))
    rec = cam.undistort_points(intr.K, intr.Kinv, intr.dist, uv)
    assert float(jnp.abs(rec - uv).max()) < 1e-3
