"""Shared linear-algebra helpers for the batched geometry solvers."""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(3,) -> 3x3 cross-product matrix [v]x."""
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def smallest_singular_vector(A: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Right singular vector of A (N, D) for the smallest singular value.

    Weighted rows (w: (N,) in [0,1]) support masked/padded systems: invalid
    rows are zeroed, which removes them from A^T A exactly.

    Uses eigh of the D x D Gram matrix rather than SVD of the tall matrix —
    far cheaper on TPU for D in {9, 12} and identical nullspace.
    """
    if w is not None:
        A = A * w[:, None]
    G = A.T @ A
    _, V = jnp.linalg.eigh(G)  # ascending eigenvalues
    return V[:, 0]


def smallest_singular_vector_direct(A: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Right singular vector for the smallest singular value, via SVD of A
    itself (not the Gram matrix).

    Costs more than the Gram/eigh path but does NOT square the condition
    number — required in float32 when the inlier threshold sits near the
    solver's noise floor (full-resolution essential estimation: a 1 px
    gate at f=2500 is 4e-4 in normalized coordinates; see
    SfMStereoUtilities.cpp:97 for the reference's gate).
    """
    if w is not None:
        A = A * w[:, None]
    n, d = A.shape
    if n < d:
        # thin SVD of a wide matrix spans only the row space and misses the
        # nullspace vector; zero rows are inert and make Vt square (d x d)
        A = jnp.concatenate([A, jnp.zeros((d - n, d), A.dtype)], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    return Vt[-1]


def hartley_normalize_2d(pts: jnp.ndarray, w: jnp.ndarray | None = None):
    """Hartley-normalize 2D points: zero centroid, mean distance sqrt(2).

    Returns (normalized_points (N,2), T (3,3)) with x_norm_h = T @ x_h.
    Masked points (w=0) are excluded from the statistics but still mapped.
    Essential for f32 DLT conditioning.
    """
    if w is None:
        w = jnp.ones(pts.shape[0], pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    centroid = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.linalg.norm(pts - centroid, axis=1)
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, _EPS)
    T = jnp.array([
        [s, 0.0, -s * centroid[0]],
        [0.0, s, -s * centroid[1]],
        [0.0, 0.0, 1.0],
    ])
    return (pts - centroid) * s, T


def hartley_normalize_3d(pts: jnp.ndarray, w: jnp.ndarray | None = None):
    """Normalize 3D points: zero centroid, mean distance sqrt(3).

    Returns (normalized_points (N,3), T (4,4)) with X_norm_h = T @ X_h.
    """
    if w is None:
        w = jnp.ones(pts.shape[0], pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    centroid = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.linalg.norm(pts - centroid, axis=1)
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(3.0) / jnp.maximum(mean_d, _EPS)
    T = jnp.eye(4)
    T = T.at[:3, :3].multiply(s)
    T = T.at[:3, 3].set(-s * centroid)
    return (pts - centroid) * s, T
