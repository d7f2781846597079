"""Evaluation-module tests: alignment identities + Strecha parser."""
import numpy as np

from tpusfm.eval import ate_rmse, camera_centers, rotation_errors_deg, umeyama_alignment


def _random_poses(n=8, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        a = rng.standard_normal(3) * 0.3
        th = np.linalg.norm(a)
        k = a / max(th, 1e-9)
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
        t = rng.standard_normal(3)
        poses.append(np.concatenate([R, t[:, None]], 1))
    return np.stack(poses).astype(np.float32)


def test_ate_zero_under_similarity():
    gt = _random_poses()
    # apply a global similarity to the camera frame: c' = s R c + t
    rng = np.random.default_rng(1)
    s = 2.5
    a = rng.standard_normal(3)
    th = np.linalg.norm(a)
    k = a / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    Rg = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    tg = rng.standard_normal(3)
    est = []
    for Rt in gt:
        R, t = Rt[:, :3], Rt[:, 3]
        c = -R.T @ t
        c2 = s * Rg @ c + tg
        R2 = R @ Rg.T
        est.append(np.concatenate([R2, (-R2 @ c2)[:, None]], 1))
    est = np.stack(est).astype(np.float32)
    assert ate_rmse(est, gt) < 1e-4
    assert rotation_errors_deg(est, gt).max() < 0.1  # f32 pose storage noise


def test_ate_detects_perturbation():
    gt = _random_poses()
    est = gt.copy()
    est[0, :, 3] += 0.5
    assert ate_rmse(est, gt) > 0.05


def test_strecha_camera_parser(tmp_path):
    import sys
    sys.path.insert(0, "benchmarks")
    from strecha_eval import load_strecha_camera

    K = np.array([[1000.0, 0, 512], [0, 1000.0, 384], [0, 0, 1]])
    R_cw = np.eye(3)
    c = np.array([1.0, 2.0, 3.0])
    lines = []
    for row in K:
        lines.append(" ".join(str(v) for v in row))
    lines.append("0 0 0")
    for row in R_cw:
        lines.append(" ".join(str(v) for v in row))
    lines.append(" ".join(str(v) for v in c))
    lines.append("1024 768")
    p = str(tmp_path / "img.camera")
    open(p, "w").write("\n".join(lines))
    K2, dist, Rt = load_strecha_camera(p)
    np.testing.assert_allclose(K2, K)
    np.testing.assert_allclose(dist, np.zeros(3))
    np.testing.assert_allclose(Rt[:, :3], np.eye(3))
    np.testing.assert_allclose(Rt[:, 3], -c)
    cc = camera_centers(Rt[None])
    np.testing.assert_allclose(cc[0], c)
