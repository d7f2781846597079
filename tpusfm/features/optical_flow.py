"""Pyramidal Lucas-Kanade optical-flow matcher (batched, pure jnp).

TPU-native re-design of the legacy OFFeatureMatcher
(legacy/SfMToyLib_Old/OFFeatureMatcher.cpp:53-183): FAST keypoints in the
left view are tracked into the right view with iterative pyramidal LK
(CPU cv::calcOpticalFlowPyrLK / CUDA gpu::PyrLKOpticalFlow, :84-105),
survivors are filtered by tracking error (err <= 12 on byte scale, :111-118),
and flow endpoints are associated back to detected right-view keypoints by
a 2 px radius match with a 0.7 ratio test + duplicate pruning (:127-151).

Design: every keypoint tracks simultaneously — the LK normal equations are
a batched (K, 2, 2) solve per iteration, window sampling is batched
bilinear gathers, and the pyramid is a static Python loop (coarse->fine).
The endpoint->keypoint association is one (K, F) distance matrix (MXU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.features.detect import (
    _DIFF3,
    _SMOOTH3,
    _bilinear,
    _conv1d_taps,
    _gaussian_kernel1d,
    _sep_conv2d,
)
from tpusfm.types import Features, Matches

_BIG = 1e9


@functools.lru_cache(maxsize=None)
def _window_offsets(radius: int):
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return np.asarray(dy, np.float32).ravel(), np.asarray(dx, np.float32).ravel()


def _lk_level(I, J, Ix, Iy, pts_prev, guess, radius: int, iters: int):
    """One pyramid level of iterative LK for all points at once.

    I, J: (h, w) images at this level; Ix, Iy: gradients of I.
    pts_prev: (K, 2) [x, y] positions in I at this level.
    guess: (K, 2) current flow estimate at this level.
    Returns refined flow (K, 2).
    """
    dy, dx = _window_offsets(radius)
    dy = jnp.asarray(dy)
    dx = jnp.asarray(dx)

    px = pts_prev[:, 0:1] + dx[None, :]     # (K, W2)
    py = pts_prev[:, 1:2] + dy[None, :]
    tmpl = _bilinear(I, py, px)             # (K, W2) template window
    gx = _bilinear(Ix, py, px)
    gy = _bilinear(Iy, py, px)

    # spatial gradient matrix G (K, 2, 2), damped for low-texture windows
    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    eps = 1e-6 + 1e-4 * (gxx + gyy)
    # closed-form 2x2 inverse of the damped gradient matrix (G + eps I)
    a = gxx + eps
    b = gxy
    c = gyy + eps
    d2 = a * c - b * b
    i00 = c / d2
    i01 = -b / d2
    i11 = a / d2

    def body(_, flow):
        qx = px + flow[:, 0:1]
        qy = py + flow[:, 1:2]
        cur = _bilinear(J, qy, qx)
        diff = tmpl - cur                    # (K, W2)
        bx = jnp.sum(diff * gx, axis=1)
        by = jnp.sum(diff * gy, axis=1)
        ux = i00 * bx + i01 * by
        uy = i01 * bx + i11 * by
        step = jnp.stack([ux, uy], axis=1)
        step = jnp.clip(step, -radius, radius)
        return flow + step

    return jax.lax.fori_loop(0, iters, body, guess)


def track_points(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    pts: jnp.ndarray,
    *,
    levels: int = 4,
    radius: int = 10,
    iters: int = 20,
    init_flow: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Track (K, 2) [x, y] points from img1 into img2.

    init_flow (K, 2) seeds the coarsest-level estimate — the legacy
    feature-seeded flow initialization (FeatureMatching.cpp:229-259 warps
    the first frame by estimateRigidTransform before Farneback; here the
    predicted displacement enters LK directly, which is the same
    basin-of-convergence fix without resampling the image).

    Returns (endpoints (K, 2), residual error (K,) mean |I - J| over the
    window on the 0..255 byte scale the legacy filter uses).
    """
    h, w = img1.shape
    blur = _gaussian_kernel1d(1.0, 2)

    pyr1, pyr2 = [], []
    lv1, lv2 = img1, img2
    for lvl in range(levels):
        if lvl > 0:
            nh, nw = max(lv1.shape[0] // 2, 16), max(lv1.shape[1] // 2, 16)
            lv1 = jax.image.resize(_sep_conv2d(lv1, blur), (nh, nw), "linear")
            lv2 = jax.image.resize(_sep_conv2d(lv2, blur), (nh, nw), "linear")
        pyr1.append(lv1)
        pyr2.append(lv2)

    flow = jnp.zeros_like(pts) if init_flow is None else init_flow
    for lvl in reversed(range(levels)):
        s = 2.0**lvl
        I, J = pyr1[lvl], pyr2[lvl]
        # Sobel/8 = smooth (1,2,1)/4 x diff (-1,0,1)/2, as shift-adds
        Ix = _conv1d_taps(_conv1d_taps(I, _SMOOTH3, 0), _DIFF3, 1)
        Iy = _conv1d_taps(_conv1d_taps(I, _SMOOTH3, 1), _DIFF3, 0)
        flow = _lk_level(I, J, Ix, Iy, pts / s, flow / s, radius, iters) * s

    # final residual at full resolution
    dy, dx = _window_offsets(3)
    px = pts[:, 0:1] + jnp.asarray(dx)[None, :]
    py = pts[:, 1:2] + jnp.asarray(dy)[None, :]
    t = _bilinear(img1, py, px)
    c = _bilinear(img2, py + flow[:, 1:2], px + flow[:, 0:1])
    err = jnp.mean(jnp.abs(t - c), axis=1) * 255.0
    return pts + flow, err


def match_pair_optical_flow(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    feats1_xy: jnp.ndarray,
    feats1_valid: jnp.ndarray,
    feats2_xy: jnp.ndarray,
    feats2_valid: jnp.ndarray,
    *,
    max_error: float = 25.0,
    assoc_radius: float = 2.0,
    ratio: float = 0.7,
    max_matches: int = 1024,
    levels: int = 4,
    iters: int = 20,
) -> Matches:
    """LK-flow matching of one view pair -> fixed-capacity Matches.

    Follows the legacy acceptance chain (OFFeatureMatcher.cpp:111-151):
    error <= 12 tracking filter, endpoint->keypoint radius match (2 px)
    with 0.7 ratio test, and right-feature dedup (best distance wins).
    """
    endpoints, err = track_points(img1, img2, feats1_xy, levels=levels, iters=iters)
    tracked = feats1_valid & (err <= max_error)

    # associate endpoints to right keypoints: (K, F2) euclidean distances
    d2 = jnp.sum((endpoints[:, None, :] - feats2_xy[None, :, :]) ** 2, axis=2)
    d2 = jnp.where(feats2_valid[None, :], d2, _BIG)
    neg2, idx2 = jax.lax.top_k(-d2, 2)
    best = jnp.sqrt(-neg2[:, 0])
    second = jnp.sqrt(jnp.maximum(-neg2[:, 1], 0.0))
    # legacy radiusMatch semantics (OFFeatureMatcher.cpp:127-140): the 0.7
    # ratio test applies only among candidates INSIDE the radius; a single
    # in-radius candidate is accepted outright
    ok = tracked & (best <= assoc_radius) & (
        (second > assoc_radius) | (best < ratio * second))

    # dedup: a right keypoint may be claimed by only one track (best wins)
    order_score = jnp.where(ok, -best, -jnp.inf)
    right = idx2[:, 0]
    # winner per right index: scatter-max of score
    f2 = feats2_xy.shape[0]
    winner_score = jnp.full((f2,), -jnp.inf).at[right].max(order_score)
    is_winner = ok & (order_score >= winner_score[right])

    score = jnp.where(is_winner, -best, -jnp.inf)
    sel_score, sel = jax.lax.top_k(score, max_matches)
    sel_ok = jnp.isfinite(sel_score)
    left = jnp.where(sel_ok, sel, -1).astype(jnp.int32)
    rsel = jnp.where(sel_ok, right[sel], -1).astype(jnp.int32)
    return Matches(
        idx=jnp.stack([left, rsel], axis=1),
        dist=jnp.where(sel_ok, -sel_score, _BIG).astype(jnp.float32),
        valid=sel_ok,
    )
