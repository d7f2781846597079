"""Synthetic multi-view scene renderer for end-to-end pipeline tests.

Renders a cloud of Gaussian-splatted 3D dots from known camera poses —
the end-to-end analog of the reference's mock-camera unit fixtures
(SfMUnitTests.cpp:80-146), extended to real imagery so the feature
detector/matcher runs too.
"""
from __future__ import annotations

import math

import numpy as np


def make_scene(n_views=5, n_dots=400, h=240, w=320, focal=300.0, seed=0):
    """Returns (images (V,H,W) f32, poses (V,3,4), K (3,3), dots (N,3))."""
    rng = np.random.default_rng(seed)
    # 3D dots in a slab in front of the cameras
    dots = np.stack([
        rng.uniform(-6, 6, n_dots),
        rng.uniform(-4.5, 4.5, n_dots),
        rng.uniform(10, 18, n_dots),
    ], axis=1).astype(np.float32)
    vals = rng.uniform(0.35, 1.0, n_dots).astype(np.float32)
    # per-dot size variation makes dots locally distinguishable (a field of
    # identical gaussians would defeat any local descriptor)
    sigmas = rng.uniform(1.0, 2.6, n_dots).astype(np.float32)

    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)

    poses = []
    for v in range(n_views):
        # cameras on a lateral arc, slightly rotating to keep the scene framed
        tx = -1.5 + 3.0 * v / max(n_views - 1, 1)
        ry = math.radians(-4.0 + 8.0 * v / max(n_views - 1, 1))
        rx = math.radians(rng.uniform(-1.0, 1.0))
        cy, sy = math.cos(ry), math.sin(ry)
        cx, sx = math.cos(rx), math.sin(rx)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float32)
        R = Ry @ Rx
        t = np.array([tx, rng.uniform(-0.2, 0.2), rng.uniform(-0.3, 0.3)], np.float32)
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    images = []
    for Rt in poses:
        pc = dots @ Rt[:, :3].T + Rt[:, 3]
        z = pc[:, 2]
        uv = (pc[:, :2] / z[:, None]) * focal + np.array([w / 2, h / 2], np.float32)
        img = np.zeros((h, w), np.float32)
        for (x, y), zz, val, sigma in zip(uv, z, vals, sigmas):
            if zz <= 0 or not (-5 <= x < w + 5 and -5 <= y < h + 5):
                continue
            r = int(3 * sigma) + 1
            x0, x1 = max(int(x) - r, 0), min(int(x) + r + 1, w)
            y0, y1 = max(int(y) - r, 0), min(int(y) + r + 1, h)
            patch = val * np.exp(
                -(((xx[y0:y1, x0:x1] - x) ** 2 + (yy[y0:y1, x0:x1] - y) ** 2)
                  / (2 * sigma**2)))
            img[y0:y1, x0:x1] = np.maximum(img[y0:y1, x0:x1], patch)
        images.append(np.clip(img, 0, 1))
    return np.stack(images), poses, K, dots


def umeyama_alignment(src: np.ndarray, dst: np.ndarray):
    """Similarity transform (s, R, t) minimizing ||dst - (s R src + t)||.

    Standard Umeyama closed form — used to compare reconstructions that
    are only defined up to a global similarity.
    """
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc**2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / max(var_s, 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t


def camera_centers(poses: np.ndarray) -> np.ndarray:
    return np.stack([-Rt[:, :3].T @ Rt[:, 3] for Rt in poses])
