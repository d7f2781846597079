"""Point-cloud post-filters (TPU-native batched kNN).

Equivalent of the legacy PCL viewer's keyboard-toggled statistical
outlier removal (legacy/Visualization.cpp:121-153: meanK=50,
stddev_mult=1.0) and its voxel-grid downsampling path
(legacy/Visualization.cpp:140-152, leaf 0.1).

PCL's StatisticalOutlierRemoval semantics: for every point compute the
mean distance to its K nearest neighbours; a point is kept iff that
mean is <= mu + stddev_mult * sigma, where mu/sigma are the
mean/stddev of the per-point means over the whole cloud.

TPU design: the kNN is a dense pairwise-distance problem — computed as
``|x|^2 + |y|^2 - 2 x.y^T`` so the hot O(N^2 * 3) term is a single
MXU matmul, tiled over query rows with ``lax.map`` to bound the
distance-matrix working set to ``tile x N``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 1024


@functools.partial(jax.jit, static_argnames=("mean_k",))
def _mean_knn_dist(points: jnp.ndarray, valid: jnp.ndarray, mean_k: int) -> jnp.ndarray:
    """Mean distance from each point to its mean_k nearest valid neighbours."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    sq = jnp.sum(pts * pts, axis=1)
    big = jnp.float32(1e30)
    pad = (-n) % _TILE
    pts_q = jnp.pad(pts, ((0, pad), (0, 0)))
    sq_q = jnp.pad(sq, ((0, pad),))
    k = min(mean_k + 1, n)  # +1: each point is its own nearest neighbour

    def tile_fn(args):
        q, qsq = args
        # (tile, N) squared distances via one matmul on the MXU.
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ pts.T)
        d2 = jnp.where(valid[None, :], d2, big)
        neg_top, _ = jax.lax.top_k(-d2, k)
        d = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
        return jnp.sum(d, axis=1) / jnp.maximum(k - 1, 1)  # drop self (d=0)

    q_tiles = pts_q.reshape(-1, _TILE, 3)
    sq_tiles = sq_q.reshape(-1, _TILE)
    means = jax.lax.map(tile_fn, (q_tiles, sq_tiles)).reshape(-1)[:n]
    return jnp.where(valid, means, 0.0)


def sor_filter_mask(
    points: np.ndarray,
    valid: np.ndarray | None = None,
    mean_k: int = 50,
    stddev_mult: float = 1.0,
) -> np.ndarray:
    """Boolean keep-mask per point (PCL StatisticalOutlierRemoval parity)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if valid is None:
        valid = np.ones((n,), bool)
    valid = np.asarray(valid, bool)
    nv = int(valid.sum())
    if nv <= mean_k:
        return valid.copy()
    means = np.asarray(_mean_knn_dist(jnp.asarray(points), jnp.asarray(valid), int(mean_k)))
    m = means[valid]
    mu = float(m.mean())
    sigma = float(m.std(ddof=1)) if nv > 1 else 0.0
    thresh = mu + stddev_mult * sigma
    return valid & (means <= thresh)


def sor_filter(
    points: np.ndarray,
    colors: np.ndarray | None = None,
    mean_k: int = 50,
    stddev_mult: float = 1.0,
):
    """Filtered (points[, colors]) — the legacy viewer's 's'-key action."""
    mask = sor_filter_mask(points, None, mean_k, stddev_mult)
    if colors is None:
        return points[mask]
    return points[mask], np.asarray(colors)[mask]


def voxel_grid_filter(
    points: np.ndarray,
    colors: np.ndarray | None = None,
    leaf_size: float = 0.1,
):
    """Voxel-grid downsample: centroid per occupied voxel
    (legacy/Visualization.cpp:140-152's pcl::VoxelGrid path, leaf 0.1)."""
    points = np.asarray(points, np.float64)
    if points.shape[0] == 0:
        return (points, colors) if colors is not None else points
    keys = np.floor(points / leaf_size).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    nvox = counts.shape[0]
    cent = np.zeros((nvox, 3))
    np.add.at(cent, inv, points)
    cent /= counts[:, None]
    if colors is None:
        return cent.astype(np.float32)
    colors = np.asarray(colors, np.float64)
    cc = np.zeros((nvox, colors.shape[1]))
    np.add.at(cc, inv, colors)
    cc /= counts[:, None]
    return cent.astype(np.float32), cc.astype(colors.dtype if colors.dtype.kind == "f" else np.float32)
