"""Synthetic Strecha-format dataset generator.

The EPFL/Strecha CVPR'08 datasets (fountain-P11, Herz-Jesu-P25) named in
BASELINE.md cannot be downloaded in this sandbox (zero egress), so this
renders a fixture in the exact on-disk format the evaluation harness
(benchmarks/strecha_eval.py) consumes: numbered PNGs plus per-image
`.camera` ground-truth files (K rows 1-3, radial distortion row 4, R
camera->world rows 5-7, camera center row 8, image size row 9 — the
Strecha convention).

The renderer draws Gaussian-splatted 3D dots (same principle as the test
scene fixtures, tests/synthetic_scene.py) and applies the Brown radial
model to the projections, so a nonzero-distortion fixture exercises the
calibrated-undistortion path end-to-end (MultiCameraDistance.cpp:78-89 /
SfMStereoUtilities.cpp:146-147 parity).
"""
from __future__ import annotations

import math
import os

import numpy as np


def _render(dots, vals, sigmas, Rt, K, dist, h, w):
    pc = dots @ Rt[:, :3].T + Rt[:, 3]
    z = pc[:, 2]
    xn = pc[:, :2] / np.maximum(z[:, None], 1e-9)
    if dist is not None and np.any(dist != 0):
        k1, k2, k3 = dist
        r2 = (xn ** 2).sum(1)
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xn = xn * radial[:, None]
    uv = xn * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for (x, y), zz, val, sigma in zip(uv, z, vals, sigmas):
        if zz <= 0 or not (-5 <= x < w + 5 and -5 <= y < h + 5):
            continue
        r = int(3 * sigma) + 1
        x0, x1 = max(int(x) - r, 0), min(int(x) + r + 1, w)
        y0, y1 = max(int(y) - r, 0), min(int(y) + r + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        img[y0:y1, x0:x1] += val * np.exp(
            -(((xx[y0:y1, x0:x1] - x) ** 2 + (yy[y0:y1, x0:x1] - y) ** 2)
              / (2.0 * sigma * sigma)))
    return np.clip(img, 0.0, 1.0)


def make_fixture(out_dir: str, n_views: int = 9, n_dots: int = 500,
                 h: int = 384, w: int = 512, focal: float = 520.0,
                 dist=(0.0, 0.0, 0.0), seed: int = 0):
    """Write a Strecha-format dataset; returns (gt_poses (V,3,4), K)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    dots = np.stack([
        rng.uniform(-7, 7, n_dots),
        rng.uniform(-5, 5, n_dots),
        rng.uniform(12, 22, n_dots),
    ], axis=1).astype(np.float64)
    vals = rng.uniform(0.35, 1.0, n_dots)
    sigmas = rng.uniform(1.0, 2.4, n_dots)
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float64)
    dist = np.asarray(dist, np.float64)

    poses = []
    for v in range(n_views):
        # a curved, converging arc (like the real fountain-P11 ring):
        # lateral + depth motion and inward rotation keep the two-view
        # geometry well-conditioned (a straight lateral track is nearly
        # degenerate for focal/depth)
        u = v / max(n_views - 1, 1)
        tx = -2.5 + 5.0 * u
        tz = 1.5 * math.sin(math.pi * u)
        ry = math.radians(-14.0 + 28.0 * u)
        rx = math.radians(float(rng.uniform(-1.0, 1.0)))
        cy, sy = math.cos(ry), math.sin(ry)
        cx, sx = math.cos(rx), math.sin(rx)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        R = Ry @ Rx
        t = np.array([tx, rng.uniform(-0.2, 0.2), tz + rng.uniform(-0.2, 0.2)])
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses)

    for v, Rt in enumerate(poses):
        img = _render(dots, vals, sigmas, Rt, K, dist, h, w)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{v:04d}.png"))
        R_cw = Rt[:, :3].T                       # camera -> world
        c = -Rt[:, :3].T @ Rt[:, 3]              # camera center, world
        lines = []
        for row in K:
            lines.append(" ".join(f"{x:.8f}" for x in row))
        lines.append(" ".join(f"{x:.8f}" for x in dist))
        for row in R_cw:
            lines.append(" ".join(f"{x:.8f}" for x in row))
        lines.append(" ".join(f"{x:.8f}" for x in c))
        lines.append(f"{w} {h}")
        with open(os.path.join(out_dir, f"{v:04d}.png.camera"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return poses, K


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/strecha_fixture"
    make_fixture(out)
    print(f"fixture written to {out}")
