"""Dense-flow matching strategy (grid flow field + interpolation).

TPU-native re-design of the legacy dense strategies in
legacy/SfMToyLib_Old/FeatureMatching.cpp: Farneback dense flow with a
coarse pass + refinement passes (:275-313) and the sparse
goodFeaturesToTrack+PyrLK variant (:314-331), selected by the
STRATEGY_USE_DENSE_OF bitmask (IDistance.h:32-35).

Instead of per-pixel Farneback polynomial expansion, the flow field is
computed by batched pyramidal LK on a regular grid (one vmapped solve for
every grid node — the same compute shape as the sparse tracker, just
denser), then bilinearly interpolated at keypoint locations. Endpoint
association mirrors the OF matcher.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusfm.features.detect import _bilinear
from tpusfm.features.optical_flow import track_points
from tpusfm.types import Matches

_BIG = 1e9


def dense_flow_field(img1: jnp.ndarray, img2: jnp.ndarray, stride: int = 8,
                     levels: int = 4, iters: int = 20):
    """Flow field on a regular grid. Returns (grid_y, grid_x, flow (Gy,Gx,2),
    err (Gy,Gx))."""
    h, w = img1.shape
    gy = jnp.arange(stride // 2, h - stride // 2, stride, dtype=jnp.float32)
    gx = jnp.arange(stride // 2, w - stride // 2, stride, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
    pts = jnp.stack([xx.ravel(), yy.ravel()], axis=1)  # (G, 2) [x, y]
    endpoints, err = track_points(img1, img2, pts, levels=levels, iters=iters)
    flow = (endpoints - pts).reshape(yy.shape + (2,))
    return gy, gx, flow, err.reshape(yy.shape)


def _sample_field(gy, gx, field, x, y):
    """Bilinear sample a grid-sampled field at continuous (x, y)."""
    # map image coords to grid coords
    fy = (y - gy[0]) / (gy[1] - gy[0])
    fx = (x - gx[0]) / (gx[1] - gx[0])
    return _bilinear(field, fy, fx)


def match_pair_dense(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    feats1_xy: jnp.ndarray,
    feats1_valid: jnp.ndarray,
    feats2_xy: jnp.ndarray,
    feats2_valid: jnp.ndarray,
    *,
    stride: int = 8,
    max_error: float = 25.0,
    assoc_radius: float = 3.0,
    max_matches: int = 1024,
) -> Matches:
    """Dense-strategy matching of one pair -> fixed-capacity Matches."""
    gy, gx, flow, err = dense_flow_field(img1, img2, stride=stride)
    fx1 = feats1_xy[:, 0]
    fy1 = feats1_xy[:, 1]
    u = _sample_field(gy, gx, flow[..., 0], fx1, fy1)
    v = _sample_field(gy, gx, flow[..., 1], fx1, fy1)
    e = _sample_field(gy, gx, err, fx1, fy1)
    endpoints = feats1_xy + jnp.stack([u, v], axis=1)
    tracked = feats1_valid & (e <= max_error)

    d2 = jnp.sum((endpoints[:, None, :] - feats2_xy[None, :, :]) ** 2, axis=2)
    d2 = jnp.where(feats2_valid[None, :], d2, _BIG)
    best_d2 = jnp.min(d2, axis=1)
    right = jnp.argmin(d2, axis=1)
    best = jnp.sqrt(best_d2)
    ok = tracked & (best <= assoc_radius)

    # one claim per right keypoint (best wins)
    f2 = feats2_xy.shape[0]
    score = jnp.where(ok, -best, -jnp.inf)
    winner = jnp.full((f2,), -jnp.inf).at[right].max(score)
    is_winner = ok & (score >= winner[right])

    sel_score, sel = jax.lax.top_k(jnp.where(is_winner, -best, -jnp.inf), max_matches)
    sel_ok = jnp.isfinite(sel_score)
    left = jnp.where(sel_ok, sel, -1).astype(jnp.int32)
    rsel = jnp.where(sel_ok, right[sel], -1).astype(jnp.int32)
    return Matches(
        idx=jnp.stack([left, rsel], axis=1),
        dist=jnp.where(sel_ok, -sel_score, _BIG).astype(jnp.float32),
        valid=sel_ok,
    )
