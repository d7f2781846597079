"""Synthetic N-view collection renderer for the BASELINE scale configs.

The per-dot Python renderer in tests/synthetic_scene.py is fine at 5-9
views; a 500-image collection (BASELINE config 4) needs a vectorized
path: all Gaussian splats render as one jitted scatter-max per view
chunk. Cameras sit on an orbit around the dot cloud — consecutive views
overlap heavily, which is the regime the windowed pair graph of
pipeline/collection.py targets (and the wraparound pairs close the
loop).

Ground truth (poses, dots) is returned for ATE evaluation exactly like
the reference's mock-camera fixtures (SfMUnitTests.cpp:80-146), at
collection scale.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_PATCH = 7  # splat half-size in pixels (covers 3 sigma of the largest dots)


def make_collection_textured(n_views: int = 500, h: int = 192, w: int = 256,
                             focal: float = 300.0, orbit_radius: float = 6.0,
                             wall_radius: float = 10.0, relief_amp: float = 1.2,
                             seed: int = 0):
    """Textured orbit collection: cameras on a ring INSIDE a cylinder of
    band-limited lattice-noise texture (benchmarks/strecha_fixture.py's
    masonry-style noise), looking outward, plus a textured ground plane.

    Every ray hits a surface, every view sees a sector of the wall, and
    consecutive views overlap heavily — the sequential-collection regime
    of BASELINE config 4/5 with sub-pixel-localizable texture (gaussian
    dot fields cap detector accuracy at ~1 px and match recall at ~20%,
    which makes them smoke-test fixtures, not benchmark fixtures).

    relief_amp displaces the wall radially by band-limited noise (true
    surface, intersected iteratively — NOT a texture warp): a perfectly
    smooth cylinder is locally planar, which makes every PnP
    quasi-degenerate (the pose slides along the plane-pose ambiguity at
    sub-pixel reprojection cost — measured 0.34 px median at 0.28x the
    true camera step) and no incremental pipeline can hold scale. Real
    photo-collection scenes have depth relief; the benchmark should too.

    Returns (images (V,H,W) f32, poses (V,3,4), K (3,3)).
    """
    from benchmarks.strecha_fixture import _value_noise3

    rng = np.random.default_rng(seed)
    s = seed + 7

    def tex(X):
        # Fine-octave-heavy lattice noise with hard contrast expansion:
        # FAST-9 needs crisp corner-like structure, and these cameras sit
        # 4-10 units from the wall, so the energy must live at finer
        # world scales than the strecha fixture's masonry (whose cameras
        # stand ~16 units back).
        v = (0.40 * _value_noise3(X, 2.0, s)
             + 0.30 * _value_noise3(X, 4.6, s + 1)
             + 0.20 * _value_noise3(X, 10.4, s + 2)
             + 0.12 * _value_noise3(X, 23.0, s + 3))
        v = (v - 0.51) * 6.0
        return 0.5 + 0.46 * np.tanh(v)
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)

    poses = []
    for v in range(n_views):
        th = 2.0 * math.pi * v / n_views
        C = np.array([orbit_radius * math.sin(th),
                      rng.uniform(-0.25, 0.25),
                      -orbit_radius * math.cos(th)], np.float64)
        fwd = np.array([math.sin(th), 0.0, -math.cos(th)])   # radially out
        # small per-view pointing jitter (handheld-style)
        fwd = fwd + np.array([rng.uniform(-0.03, 0.03),
                              rng.uniform(-0.02, 0.02),
                              rng.uniform(-0.03, 0.03)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])
        t = -R @ C
        poses.append(np.concatenate([R, t[:, None]], axis=1).astype(np.float32))
    poses = np.stack(poses)

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    xn = np.stack([(xs - w / 2) / focal, (ys - h / 2) / focal,
                   np.ones_like(xs)], -1).reshape(-1, 3)
    images = np.empty((n_views, h, w), np.float32)
    for v, Rt in enumerate(poses):
        R = Rt[:, :3].astype(np.float64)
        o = -R.T @ Rt[:, 3].astype(np.float64)
        d = xn @ R                                   # rays in world frame
        # cylinder x^2 + z^2 = wall_radius^2 (camera is inside: the
        # positive root always exists)
        a = d[:, 0] ** 2 + d[:, 2] ** 2
        b = 2.0 * (o[0] * d[:, 0] + o[2] * d[:, 2])

        def cyl_hit(radius):
            c = o[0] ** 2 + o[2] ** 2 - radius ** 2
            disc = np.maximum(b * b - 4 * a * c, 0.0)
            return (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-12)

        t_wall = cyl_hit(wall_radius)
        if relief_amp > 0.0:
            # displaced surface r(theta, y) = R + amp * noise: fixed-point
            # refinement of the ray/surface intersection (amp << R so 3
            # sweeps land well under a pixel) — a real 3D surface seen
            # consistently from every view, not a per-view warp
            for _ in range(3):
                Xw = o[None, :] + t_wall[:, None] * d
                bump = relief_amp * 2.0 * (
                    _value_noise3(Xw, 0.55, s + 9) - 0.5)
                t_wall = cyl_hit(wall_radius + bump)
        # ground plane y = +3 (y points down in the camera convention)
        t_gnd = np.where(d[:, 1] > 1e-9, (3.0 - o[1]) / d[:, 1], np.inf)
        t_hit = np.minimum(t_wall, t_gnd)
        X = o[None, :] + t_hit[:, None] * d
        # noise-coordinate scale 2.2: cameras here sit 4-10 units from the
        # wall (vs ~16 in the strecha fixture), so the texture must be
        # proportionally finer to land the same on-screen feature scale
        images[v] = np.clip(tex(X), 0.0, 1.0).reshape(h, w).astype(np.float32)
    return images, poses, K


@functools.partial(jax.jit, static_argnums=(4, 5))
def _render_chunk(poses, dots, vals, sigmas, h: int, w: int, focal):
    """Render (B, h, w) images of Gaussian dots by scatter-max splatting."""
    offs = jnp.arange(-_PATCH, _PATCH + 1)
    dys, dxs = jnp.meshgrid(offs, offs, indexing="ij")          # (K, K)

    def one(Rt):
        pc = dots @ Rt[:, :3].T + Rt[:, 3]
        z = pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        uv = pc[:, :2] / zs[:, None] * focal + jnp.array([w / 2.0, h / 2.0])
        cx = jnp.round(uv[:, 0]).astype(jnp.int32)
        cy = jnp.round(uv[:, 1]).astype(jnp.int32)
        xs = cx[:, None, None] + dxs[None]                       # (N, K, K)
        ys = cy[:, None, None] + dys[None]
        d2 = ((xs - uv[:, 0, None, None]) ** 2
              + (ys - uv[:, 1, None, None]) ** 2)
        val = vals[:, None, None] * jnp.exp(-d2 / (2.0 * sigmas[:, None, None] ** 2))
        ok = ((z > 0.1)[:, None, None] & (xs >= 0) & (xs < w)
              & (ys >= 0) & (ys < h))
        flat = jnp.where(ok, ys * w + xs, h * w)                 # trash slot
        img = jnp.zeros(h * w + 1, jnp.float32).at[flat.ravel()].max(
            jnp.where(ok, val, 0.0).ravel())
        return jnp.clip(img[: h * w].reshape(h, w), 0.0, 1.0)

    return jax.vmap(one)(poses)


def make_collection(n_views: int = 500, n_dots: int = 1500, h: int = 192,
                    w: int = 256, focal: float = 220.0,
                    orbit_radius: float = 16.0, arc_degrees: float = 360.0,
                    dot_radius: float = 5.0, seed: int = 0, chunk: int = 32):
    """Returns (images (V,H,W) f32, poses (V,3,4), K (3,3), dots (N,3)).

    Cameras orbit the dot cloud at orbit_radius over arc_degrees (360 =
    a closed loop, pair it with collection_wraparound=True). Choose
    dot_radius large relative to the FOV (e.g. dot_radius=8, focal=340,
    orbit_radius=13) to give each view a SECTOR of the scene instead of
    the whole cloud — the internet-photo-collection regime where the
    per-view visible blob count stays under the feature capacity."""
    rng = np.random.default_rng(seed)
    dots = rng.uniform(-dot_radius, dot_radius, (n_dots, 3)).astype(np.float32)
    dots *= np.array([1.0, 0.7, 1.0], np.float32)    # flatten vertically
    vals = rng.uniform(0.35, 1.0, n_dots).astype(np.float32)
    sigmas = rng.uniform(1.0, 2.4, n_dots).astype(np.float32)
    # each dot gets a dimmer satellite blob at a random 3D offset: the
    # asymmetric local pattern diversifies the BRIEF descriptors (a field
    # of identical round gaussians makes best/second-best ratios ~1 and
    # starves the Lowe test — same trick as tests/synthetic_scene.py,
    # strengthened for the denser collection scenes)
    sat = dots + rng.uniform(-0.28, 0.28, (n_dots, 3)).astype(np.float32)
    sat_vals = (vals * rng.uniform(0.45, 0.9, n_dots)).astype(np.float32)
    sat_sig = (sigmas * rng.uniform(0.4, 0.7, n_dots)).astype(np.float32)
    dots_r = np.concatenate([dots, sat])
    vals_r = np.concatenate([vals, sat_vals])
    sigmas_r = np.concatenate([sigmas, sat_sig])
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)

    closed = abs(arc_degrees - 360.0) < 1e-6
    poses = []
    for v in range(n_views):
        th = math.radians(arc_degrees) * v / (n_views if closed
                                              else max(n_views - 1, 1))
        C = np.array([orbit_radius * math.sin(th),
                      rng.uniform(-0.4, 0.4),
                      -orbit_radius * math.cos(th)], np.float32)
        fwd = -C / np.linalg.norm(C)                  # look at the origin
        up = np.array([0.0, -1.0, 0.0], np.float32)   # image +y is down
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd]).astype(np.float32)
        t = -R @ C
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses)

    images = np.empty((n_views, h, w), np.float32)
    for s in range(0, n_views, chunk):
        blk = poses[s:s + chunk]
        n = len(blk)
        if n < chunk:   # pad so the jit compiles exactly once
            blk = np.concatenate([blk, np.repeat(blk[-1:], chunk - n, 0)])
        images[s:s + n] = np.asarray(_render_chunk(
            jnp.asarray(blk), jnp.asarray(dots_r), jnp.asarray(vals_r),
            jnp.asarray(sigmas_r), h, w, focal))[:n]
    return images, poses, K, dots
