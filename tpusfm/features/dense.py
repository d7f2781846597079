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


def estimate_similarity_2d(xy1: jnp.ndarray, xy2: jnp.ndarray,
                           w: jnp.ndarray, rounds: int = 3):
    """Weighted 2D similarity xy2 ~ s R xy1 + t from matched points.

    The seeding transform of the legacy dense strategy
    (FeatureMatching.cpp:229-259, cv::estimateRigidTransform over the
    ratio-test matches). Closed-form Umeyama in 2D, with ``rounds`` of
    inlier reweighting (residual <= 3 x median) instead of its internal
    RANSAC. Returns (A (2,2), t (2,), ok) with A = s R.
    """

    def fit(wgt):
        sw = jnp.maximum(jnp.sum(wgt), 1e-9)
        mu1 = jnp.sum(xy1 * wgt[:, None], 0) / sw
        mu2 = jnp.sum(xy2 * wgt[:, None], 0) / sw
        c1 = xy1 - mu1
        c2 = xy2 - mu2
        # complex-number form of the 2D similarity LS fit:
        #   (a + ib) = sum w z2 conj(z1) / sum w |z1|^2
        num_re = jnp.sum(wgt * (c2[:, 0] * c1[:, 0] + c2[:, 1] * c1[:, 1]))
        num_im = jnp.sum(wgt * (c2[:, 1] * c1[:, 0] - c2[:, 0] * c1[:, 1]))
        den = jnp.maximum(jnp.sum(wgt * jnp.sum(c1 * c1, 1)), 1e-9)
        a = num_re / den
        b = num_im / den
        A = jnp.array([[a, -b], [b, a]])
        t = mu2 - mu1 @ A.T
        return A, t

    wgt = w.astype(xy1.dtype)
    A, t = fit(wgt)
    for _ in range(rounds):
        r = jnp.linalg.norm(xy1 @ A.T + t - xy2, axis=1)
        med = jnp.median(jnp.where(w > 0, r, jnp.nan))
        med = jnp.nan_to_num(med, nan=1e9)
        wgt = w.astype(xy1.dtype) * (r <= 3.0 * med + 1.0)
        A, t = fit(wgt)
    ok = (jnp.sum(wgt) >= 6) & jnp.all(jnp.isfinite(A)) & jnp.all(jnp.isfinite(t))
    return A, t, ok


def dense_flow_field(img1: jnp.ndarray, img2: jnp.ndarray, stride: int = 8,
                     levels: int = 4, iters: int = 20,
                     seed_A: jnp.ndarray | None = None,
                     seed_t: jnp.ndarray | None = None):
    """Flow field on a regular grid. Returns (grid_y, grid_x, flow (Gy,Gx,2),
    err (Gy,Gx)). seed_A/seed_t initialize each node's flow with the
    global similarity prediction (legacy rigid-transform seeding)."""
    h, w = img1.shape
    gy = jnp.arange(stride // 2, h - stride // 2, stride, dtype=jnp.float32)
    gx = jnp.arange(stride // 2, w - stride // 2, stride, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
    pts = jnp.stack([xx.ravel(), yy.ravel()], axis=1)  # (G, 2) [x, y]
    init = None
    if seed_A is not None:
        init = pts @ seed_A.T + seed_t - pts
    endpoints, err = track_points(img1, img2, pts, levels=levels, iters=iters,
                                  init_flow=init)
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
    seed_with_features: bool = True,
    feats1_desc: jnp.ndarray | None = None,
    feats2_desc: jnp.ndarray | None = None,
) -> Matches:
    """Dense-strategy matching of one pair -> fixed-capacity Matches.

    With seed_with_features (and descriptors provided), a global 2D
    similarity is estimated from ratio-test feature matches and seeds the
    flow initialization — the legacy estimateRigidTransform pass
    (FeatureMatching.cpp:229-259) that makes the dense path usable on
    large-baseline pairs where zero-initialized LK diverges.
    """
    seed_A = seed_t = None
    if seed_with_features and feats1_desc is not None and feats2_desc is not None:
        from tpusfm.features.match import match_pair

        m = match_pair(feats1_desc, feats1_valid, feats2_desc, feats2_valid,
                       ratio=0.8, max_matches=256)
        li = jnp.maximum(m.idx[:, 0], 0)
        ri = jnp.maximum(m.idx[:, 1], 0)
        A, t, ok = estimate_similarity_2d(
            feats1_xy[li], feats2_xy[ri], m.valid)
        eye = jnp.eye(2, dtype=jnp.float32)
        seed_A = jnp.where(ok, A, eye)
        seed_t = jnp.where(ok, t, jnp.zeros(2, jnp.float32))
    gy, gx, flow, err = dense_flow_field(img1, img2, stride=stride,
                                         seed_A=seed_A, seed_t=seed_t)
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
