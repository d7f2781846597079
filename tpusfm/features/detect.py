"""Batched keypoint detection + steered-BRIEF description (pure jnp).

TPU-native re-design of the reference's ORB usage
(SfMToyLib/SfM2DFeatureUtilities.cpp:37-51: ``cv::ORB::create(5000)`` +
``detectAndCompute``). Instead of OpenCV's per-pixel serial detector this
runs every stage as dense array ops over the whole image (VPU-friendly)
and a fixed image pyramid:

  1. FAST-9 segment test, fully vectorized: the 16-pixel Bresenham circle
     is materialized as 16 shifted copies and the "9 contiguous brighter/
     darker" test is a windowed product over the circular axis.
  2. Harris corner response for ranking (what cv::ORB's HARRIS_SCORE does).
  3. 3x3 non-max suppression + per-level top-k -> global top-k (static K).
  4. Orientation by intensity centroid (ORB's method, radius-15 patch).
  5. Steered BRIEF-256: a fixed Gaussian point-pair pattern rotated by the
     keypoint angle, bilinearly sampled from the blurred level image.

Descriptors are returned as +-1 float vectors: for D-bit descriptors,
hamming(a, b) = (D - a . b) / 2, so brute-force matching is one matmul on
the MXU (see features/match.py).

All shapes are static; invalid keypoints are masked, never dropped.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm.types import Features

# 16-pixel Bresenham circle of radius 3 (clockwise from 12 o'clock),
# the same circle cv::FAST uses.
_FAST_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    np.int32,
)  # (dx, dy)

_FAST_ARC = 9  # FAST-9: need >= 9 contiguous circle pixels all brighter/darker

# BRIEF-256 sampling pattern: point pairs ~ N(0, (patch/5)^2), clipped to the
# patch, generated once with a fixed seed (learned ORB patterns are data;
# an isotropic Gaussian pattern is the classic BRIEF construction).
_PATCH_RADIUS = 13.0


@functools.lru_cache(maxsize=None)
def _brief_pattern(bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH_RADIUS / 2.0, size=(bits, 2, 2))
    return np.clip(pts, -_PATCH_RADIUS, _PATCH_RADIUS).astype(np.float32)


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _conv1d_taps(img: jnp.ndarray, k, axis: int) -> jnp.ndarray:
    """1D cross-correlation along ``axis`` as unrolled shifted fused
    multiply-adds (SAME zero padding).

    XLA's conv op with a single channel pads the channel axis up to the
    TPU lane width, wasting >100x of the MXU/VPU — the dense convs were
    the detector's dominant cost (~40 ms per stage at 7x768x1024 vs ~2 ms
    as shift-adds). Static slices of one padded copy fuse into a single
    VPU loop.
    """
    taps = int(k.shape[0])
    r = (taps - 1) // 2
    pads = [(0, 0), (0, 0)]
    pads[axis] = (r, taps - 1 - r)
    xp = jnp.pad(img, pads)
    h, w = img.shape
    out = None
    for i in range(taps):
        sl = xp[i:i + h, :] if axis == 0 else xp[:, i:i + w]
        term = k[i] * sl
        out = term if out is None else out + term
    return out


def _sep_conv2d(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution of (H, W) with a 1D kernel (SAME padding)."""
    return _conv1d_taps(_conv1d_taps(img, k, 0), k, 1)


# numpy on purpose: module-level jnp.array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize in
# multi-host entry points (it must run before any backend touch)
_SMOOTH3 = np.array([1.0, 2.0, 1.0], np.float32) / 4.0
_DIFF3 = np.array([-1.0, 0.0, 1.0], np.float32) / 2.0


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so result[y, x] = img[y + dy, x + dx]; borders are masked later."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_harris_response(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9 corner mask scored by Harris response; -inf elsewhere."""
    resp, _ = fast_harris_maps(img, threshold)
    return resp


def fast_harris_maps(img: jnp.ndarray, threshold: float, score: str = "harris"):
    """(masked_response, dense_harris) maps.

    img: (H, W) float32 in [0, 1]; threshold on the same intensity scale
    (the reference's FAST threshold is on 0..255 bytes). masked_response
    is the corner score on FAST-9 corners and -inf elsewhere; the dense
    surface is unmasked (for sub-pixel parabola fits). score="harris" is
    cv::ORB's HARRIS_SCORE ranking; score="min_eig" is the Shi-Tomasi
    minimum eigenvalue that the legacy goodFeaturesToTrack sparse-LK seed
    uses (FeatureMatching.cpp:314-331).
    """
    center = img
    ring = jnp.stack(
        [_shift2d(img, int(dy), int(dx)) for dx, dy in _FAST_CIRCLE], axis=-1
    )  # (H, W, 16)
    brighter = ring > center[..., None] + threshold
    darker = ring < center[..., None] - threshold

    def has_arc(m):
        # windowed AND of length _FAST_ARC over the circular 16-axis
        m2 = jnp.concatenate([m, m[..., : _FAST_ARC - 1]], axis=-1)
        acc = jnp.ones_like(m[..., :16])
        for k in range(_FAST_ARC):
            acc = acc & m2[..., k : k + 16]
        return jnp.any(acc, axis=-1)

    is_corner = has_arc(brighter) | has_arc(darker)

    # Harris ranking (cv::ORB::HARRIS_SCORE equivalent); Sobel factors
    # into smooth (1,2,1)/4 x diff (-1,0,1)/2
    ix = _conv1d_taps(_conv1d_taps(img, _SMOOTH3, 0), _DIFF3, 1)
    iy = _conv1d_taps(_conv1d_taps(img, _SMOOTH3, 1), _DIFF3, 0)
    g = _gaussian_kernel1d(1.5, 3)
    ixx = _sep_conv2d(ix * ix, g)
    iyy = _sep_conv2d(iy * iy, g)
    ixy = _sep_conv2d(ix * iy, g)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    if score == "min_eig":
        resp = 0.5 * tr - jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    else:
        resp = det - 0.04 * tr * tr
    return jnp.where(is_corner, resp, -jnp.inf), resp


def _nms3(resp: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression: keep strict local maxima."""
    neg = jnp.finfo(resp.dtype).min
    mx = jax.lax.reduce_window(
        resp, neg, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(resp >= mx, resp, -jnp.inf)


def _border_mask(shape, margin: int) -> jnp.ndarray:
    h, w = shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at float coords; clamped to borders."""
    h, w = img.shape
    y = jnp.clip(y, 0.0, h - 1.001)
    x = jnp.clip(x, 0.0, w - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = y - y0
    fx = x - x0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _conv_sep(img: jnp.ndarray, ky: jnp.ndarray, kx: jnp.ndarray) -> jnp.ndarray:
    """Separable conv: 1D kernel along y then along x (cross-correlation)."""
    return _conv1d_taps(_conv1d_taps(img, ky, 0), kx, 1)


def _orientation_maps(img: jnp.ndarray, radius: int = 15):
    """Dense m10/m01 intensity-centroid moment maps (ORB's IC_Angle).

    Square-patch moments factor into separable 1-D convolutions
    (ramp x box), ~30x fewer taps than the dense 31x31 circular kernel
    and a far better XLA mapping; the centroid direction is nearly
    identical to the circular-patch version."""
    ramp = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    box = jnp.ones((2 * radius + 1,), jnp.float32)
    m10 = _conv_sep(img, box, ramp)   # sum I(y+dy, x+dx) * dx
    m01 = _conv_sep(img, ramp, box)   # sum I(y+dy, x+dx) * dy
    return m10, m01


def _subpixel_offsets(resp: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Quadratic (parabolic) sub-pixel localization on the response map.

    The reference inherits OpenCV ORB's integer keypoint grid; at full
    resolution that integer error is the accuracy floor of every
    downstream geometric gate, so we refine. Offsets are clamped to
    +-0.5 px; keypoints on -inf plateaus (masked NMS neighbors) get 0.
    """
    h, w = resp.shape
    y0 = jnp.clip(ys, 1, h - 2)
    x0 = jnp.clip(xs, 1, w - 2)

    def axis_offset(rm, r0, rp):
        denom = rm - 2.0 * r0 + rp
        off = 0.5 * (rm - rp) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        ok = jnp.isfinite(off) & jnp.isfinite(rm) & jnp.isfinite(rp) & (jnp.abs(denom) > 1e-12)
        return jnp.clip(jnp.where(ok, off, 0.0), -0.5, 0.5)

    dx = axis_offset(resp[y0, x0 - 1], resp[y0, x0], resp[y0, x0 + 1])
    dy = axis_offset(resp[y0 - 1, x0], resp[y0, x0], resp[y0 + 1, x0])
    return dy, dx


def _brief_descriptors(
    img: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    angles: jnp.ndarray,
    bits: int,
    sampling: str = "nearest",
) -> jnp.ndarray:
    """Steered BRIEF: +-1 descriptor (K, bits) from the blurred image.

    sampling="nearest" rounds sample coordinates to integer pixels — on a
    sigma=2-blurred image the value differs from the bilinear read by far
    less than the blur scale, and it costs ONE gather per sample instead
    of four. Gathers are the detector's dominant cost on TPU (they run on
    the scalar/vector units, ~60 M elem/s), so this is a 4x cut of the
    hot path; cv::ORB itself samples integer pixels (cvRound) for the
    same reason. "bilinear" keeps the exact interpolated read.
    """
    pattern = jnp.asarray(_brief_pattern(bits))  # (bits, 2, 2) [pair, point, (dx,dy)]
    c, s = jnp.cos(angles), jnp.sin(angles)  # (K,)
    # rotate pattern offsets per keypoint: (K, bits, 2, 2)
    px = pattern[None, :, :, 0]
    py = pattern[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py
    sy = ys[:, None, None] + ry
    sx = xs[:, None, None] + rx
    if sampling == "nearest":
        h, w = img.shape
        yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, w - 1)
        vals = img[yi, xi]
    else:
        vals = _bilinear(img, sy, sx)  # (K, bits, 2)
    return jnp.where(vals[:, :, 0] > vals[:, :, 1], 1.0, -1.0).astype(jnp.float32)


def _detect_level(img, threshold: float, k: int, margin: int, score_kind: str = "harris"):
    """Top-k corners on one pyramid level with sub-pixel localization.

    Returns (score, y_float, x_float, y_int, x_int) of length k."""
    masked, harris = fast_harris_maps(img, threshold, score=score_kind)
    resp = _nms3(masked)
    resp = jnp.where(_border_mask(img.shape, margin), resp, -jnp.inf)
    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, k)
    w = img.shape[1]
    yi, xi = idx // w, idx % w
    # sub-pixel parabola fit on the dense (unmasked) Harris surface
    dy, dx = _subpixel_offsets(harris, yi, xi)
    return score, yi.astype(jnp.float32) + dy, xi.astype(jnp.float32) + dx, yi, xi


def _level_pipeline(imgs, *, threshold, per_level, margin, desc_bits, blur_sigma,
                    score_kind="harris", sampling="nearest"):
    """Detect + orient + describe one pyramid level for all views.

    imgs: (V, h, w). Returns per-view (score, x, y, ang, desc) arrays of
    length per_level (level-local pixel coordinates).
    """
    blur = _gaussian_kernel1d(blur_sigma, 4)

    def one(img):
        smooth = _sep_conv2d(img, blur)
        score, lyf, lxf, lyi, lxi = _detect_level(img, threshold, per_level, margin,
                                                  score_kind)
        m10, m01 = _orientation_maps(smooth)
        ang = jnp.arctan2(m01[lyi, lxi], m10[lyi, lxi])
        desc = _brief_descriptors(smooth, lyf, lxf, ang, desc_bits, sampling)
        return score, lxf, lyf, ang, desc

    return jax.vmap(one)(imgs)


@functools.lru_cache(maxsize=None)
def _level_kernel(threshold: float, per_level: int, margin: int,
                  desc_bits: int, blur_sigma: float, score_kind: str = "harris",
                  sampling: str = "nearest"):
    """One jit-compiled program per pyramid level: compiling L small
    programs is far cheaper than one giant L-level unrolled graph (the
    monolithic version took minutes of XLA compile at full resolution)."""
    return jax.jit(functools.partial(
        _level_pipeline, threshold=threshold, per_level=per_level,
        margin=margin, desc_bits=desc_bits, blur_sigma=blur_sigma,
        score_kind=score_kind, sampling=sampling))


@functools.lru_cache(maxsize=None)
def _resize_kernel(h: int, w: int):
    return jax.jit(lambda imgs: jax.vmap(
        lambda im: jax.image.resize(im, (h, w), "linear"))(imgs))


@functools.lru_cache(maxsize=None)
def _merge_kernel(max_features: int):
    @jax.jit
    def merge(score, x, y, ang, desc):
        """Global top-k across all levels' candidates (per view)."""

        def one(s, xx, yy, aa, dd):
            top_score, top_idx = jax.lax.top_k(s, max_features)
            valid = jnp.isfinite(top_score)
            xy = jnp.stack([xx[top_idx], yy[top_idx]], axis=1)
            return Features(
                xy=jnp.where(valid[:, None], xy, 0.0),
                desc=jnp.where(valid[:, None], dd[top_idx], 0.0),
                score=jnp.where(valid, top_score, 0.0),
                angle=aa[top_idx],
                valid=valid,
            )

        return jax.vmap(one)(score, x, y, ang, desc)

    return merge


def extract_features(
    images: jnp.ndarray,
    *,
    max_features: int = 2048,
    desc_bits: int = 256,
    pyramid_levels: int = 4,
    pyramid_scale: float = 1.2,
    fast_threshold: float = 20.0 / 255.0,
    blur_sigma: float = 2.0,
    margin: int = 24,
    score_kind: str = "harris",
    sampling: str = "nearest",
) -> Features:
    """Batched detection over (V, H, W) grayscale images -> Features (V, F).

    The TPU equivalent of the reference's per-image ORB loop
    (SfM.cpp:141-154, cap 5000 @ SfM2DFeatureUtilities.cpp:39): each
    pyramid level runs as its own jitted, view-vmapped program; candidates
    from all levels compete in a final global top-k per view.
    """
    images = jnp.asarray(images, jnp.float32)
    v, h, w = images.shape
    # ceil division: the level candidates together must cover the final
    # global top-k (floor division left 6x853=5118 < 5120 and top_k
    # rejects k > axis size)
    per_level = max(-(-max_features // max(pyramid_levels, 1)), 256)
    level_fn = _level_kernel(float(fast_threshold), per_level, margin,
                             desc_bits, float(blur_sigma), score_kind, sampling)

    scores, xs, ys, angs, descs = [], [], [], [], []
    for lvl in range(pyramid_levels):
        scale = pyramid_scale**lvl
        if lvl == 0:
            level_imgs = images
        else:
            lh = max(int(round(h / scale)), 2 * margin + 2)
            lw = max(int(round(w / scale)), 2 * margin + 2)
            level_imgs = _resize_kernel(lh, lw)(images)
        s, lx, ly, a, d = level_fn(level_imgs)
        scores.append(s)
        xs.append(lx * scale)
        ys.append(ly * scale)
        angs.append(a)
        descs.append(d)

    cat = lambda t: jnp.concatenate(t, axis=1)
    return _merge_kernel(max_features)(cat(scores), cat(xs), cat(ys), cat(angs), cat(descs))


def extract_features_single(img: jnp.ndarray, **kwargs) -> Features:
    """Single-image convenience wrapper -> Features (1, F, ...)."""
    return extract_features(img[None], **kwargs)
