"""Synthetic Strecha-format dataset generator.

The EPFL/Strecha CVPR'08 datasets (fountain-P11, Herz-Jesu-P25) named in
BASELINE.md cannot be downloaded in this sandbox (zero egress), so this
renders a fixture in the exact on-disk format the evaluation harness
(benchmarks/strecha_eval.py) consumes: numbered PNGs plus per-image
`.camera` ground-truth files (K rows 1-3, radial distortion row 4, R
camera->world rows 5-7, camera center row 8, image size row 9 — the
Strecha convention).

Scene: a ray-cast corner of three textured planes (two converging walls
plus a ground plane — the Herz-Jesu facade geometry), shaded with
band-limited procedural 3D noise so every surface carries dense,
sub-pixel-localizable texture the way real masonry does. Gaussian-dot
scenes (tests/synthetic_scene.py) are fine for smoke tests but their
blob centers localize to ~1 px, which is too coarse for a meaningful
ATE benchmark; ray-cast texture is not.

The Brown radial model is applied in the renderer (each pixel's ray is
cast through the inverse-distorted normalized coordinate), so a
nonzero-distortion fixture exercises the calibrated-undistortion path
end-to-end (MultiCameraDistance.cpp:78-89 / SfMStereoUtilities.cpp:146-147
parity).
"""
from __future__ import annotations

import math
import os

import numpy as np


def _hash3(ix, iy, iz, seed):
    """Integer-lattice hash -> [0, 1) (vectorized, deterministic)."""
    h = (ix * 374761393 + iy * 668265263 + iz * 2147483647 + seed * 144665) \
        & 0x7FFFFFFF
    h = (h ^ (h >> 13)) * 1274126177 & 0x7FFFFFFF
    return ((h ^ (h >> 16)) & 0xFFFFFF) / float(0x1000000)


def _value_noise3(X, scale, seed):
    """Trilinear-interpolated lattice value noise at one octave."""
    P = X * scale
    i = np.floor(P).astype(np.int64)
    f = P - i
    f = f * f * (3.0 - 2.0 * f)           # smoothstep
    out = np.zeros(X.shape[:-1])
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                h = _hash3(i[..., 0] + dx, i[..., 1] + dy, i[..., 2] + dz, seed)
                wgt = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                out += wgt * h
    return out


def _noise3(seed: int, detail: float = 1.0):
    """Aperiodic multi-octave 3D value noise.

    Hash-lattice noise, NOT sinusoids: a sum of global sinusoids is
    quasi-periodic, which floods the matcher with repeated patterns and
    poisons the track graph with self-similar correspondences; lattice
    noise is locally distinctive everywhere (like real masonry).

    detail > 1 extends the octave cascade toward finer world scales
    (amplitudes continuing the ~0.55x-per-octave rolloff). A 4K render
    of the SAME band-limited texture puts every feature at 6x the pixel
    scale — outside the FAST-9 detection band — while a real 4K photo
    has detail down to the pixel; the extra octaves restore that."""

    def tex(X):                           # X (..., 3) -> value in [0, 1]
        v = (0.5 * _value_noise3(X, 0.9, seed)
             + 0.28 * _value_noise3(X, 2.3, seed + 1)
             + 0.16 * _value_noise3(X, 5.1, seed + 2)
             + 0.08 * _value_noise3(X, 11.7, seed + 3))
        amp, scale, k = 0.14, 26.0, 4
        while scale < 11.7 * detail:
            v = v + amp * _value_noise3(X, scale, seed + k)
            amp, scale, k = amp * 0.65, scale * 2.2, k + 1
        v = (v - 0.5) * 2.8
        return 0.5 + 0.42 * np.tanh(v)

    return tex


def _inverse_distort(xn, dist, iters: int = 8):
    """Per-pixel inverse Brown radial model (vectorized fixed point)."""
    k1, k2, k3 = dist
    x = xn.copy()
    for _ in range(iters):
        r2 = (x ** 2).sum(-1, keepdims=True)
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        x = x - (x * radial - xn)
    return x


# corner scene: n . X = c  (two walls meeting at x=0 + a ground plane)
_PLANES = [
    (np.array([0.35, 0.0, 1.0]), 16.0),     # left wall, slanted toward +x
    (np.array([-0.35, 0.0, 1.0]), 16.0),    # right wall
    (np.array([0.0, 1.0, -0.12]), 4.0),     # ground: y ~ 4 + 0.12 z
]


def _render(Rt, K, dist, h, w, tex):
    f = np.array([K[0, 0], K[1, 1]])
    pp = np.array([K[0, 2], K[1, 2]])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    px = np.stack([xs, ys], -1).reshape(-1, 2)
    xn = (px - pp) / f
    if dist is not None and np.any(dist != 0):
        xn = _inverse_distort(xn, dist)
    R = Rt[:, :3]
    o = -R.T @ Rt[:, 3]                                   # camera center
    d = np.concatenate([xn, np.ones((len(xn), 1))], 1) @ R  # rays, world
    best_t = np.full(len(xn), np.inf)
    for n0, c0 in _PLANES:
        nn = np.linalg.norm(n0)
        n, c = n0 / nn, c0 / nn
        denom = d @ n
        t = (c - o @ n) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        ok = (t > 0.5) & (t < best_t)
        best_t = np.where(ok, t, best_t)
    X = o[None, :] + best_t[:, None] * d
    img = tex(X)
    img = np.where(np.isfinite(best_t), img, 0.05)
    return np.clip(img.reshape(h, w), 0.0, 1.0).astype(np.float32)


def make_fixture(out_dir: str, n_views: int = 9,
                 h: int = 384, w: int = 512, focal: float = 520.0,
                 dist=(0.0, 0.0, 0.0), seed: int = 0, **_legacy):
    """Write a Strecha-format dataset; returns (gt_poses (V,3,4), K).

    Texture detail scales with the render resolution (see _noise3) so
    high-resolution configs have detectable pixel-scale structure."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    tex = _noise3(seed + 7, detail=max(w / 512.0, 1.0))
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
        img = _render(Rt, K, dist, h, w, tex)
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
