"""Synthetic mock-camera fixtures.

Reimplements (from scratch, in JAX) the reference's unit-test fixture
pattern (SfMToyLib/SfMUnitTests.cpp:53-146): fixed intrinsics, 12 canned 3D
points, mock cameras at known Euler poses, ground-truth 2D observations via
projection. Every geometry/BA test validates recovery against these.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from tpusfm import camera
from tpusfm.types import Intrinsics

# Reference fixture: f=700, principal point 640x480 (SfMUnitTests.cpp:53-56)
FOCAL = 700.0
PP = (640.0, 480.0)


def intrinsics() -> Intrinsics:
    return Intrinsics.create(FOCAL, PP[0], PP[1])


def canned_points() -> jnp.ndarray:
    """12 hand-written 3D points (in the spirit of SfMUnitTests.cpp:59-71)."""
    return jnp.array(
        [
            [-1.0, -1.0, 10.0],
            [1.0, -1.0, 10.0],
            [1.0, 1.0, 10.0],
            [-1.0, 1.0, 10.0],
            [-2.0, -2.0, 14.0],
            [2.0, -2.0, 14.0],
            [2.0, 2.0, 14.0],
            [-2.0, 2.0, 14.0],
            [0.5, 0.0, 8.0],
            [0.0, 0.5, 9.0],
            [-0.5, 0.3, 12.0],
            [0.3, -0.5, 11.0],
        ],
        jnp.float32,
    )


def dense_points(n: int = 200, seed: int = 0) -> jnp.ndarray:
    """A richer random cloud in front of the cameras for RANSAC/BA tests."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(-3, 3, n),
            rng.uniform(8, 20, n),
        ],
        axis=1,
    ).astype(np.float32)
    return jnp.asarray(pts)


def mock_pose(euler_deg=(5.0, 5.0, 5.0), t=(-10.0, 0.0, 30.0)) -> jnp.ndarray:
    """Euler(5,5,5)deg, t=(-10,0,30) — the reference mock camera
    (SfMUnitTests.cpp:80-95). Returns camera-from-world 3x4 [R|t]
    where the camera center sits so that points at z~10 project in-frame.
    """
    r = [math.radians(a) for a in euler_deg]
    R = camera.euler_to_matrix(*r)
    return camera.make_pose(R, jnp.asarray(t, jnp.float32))


def stereo_poses():
    """Two mock cameras as in generateStereoViews (SfMUnitTests.cpp:105-146)."""
    p1 = mock_pose((5.0, 5.0, 5.0), (-1.0, 0.0, 1.0))
    p2 = mock_pose((-5.0, 0.0, 5.0), (1.0, 0.0, 0.8))
    return p1, p2


def project(Rt, pts, intr: Intrinsics | None = None):
    intr = intr or intrinsics()
    return camera.project_points(Rt, intr.K, pts)
