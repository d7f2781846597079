"""Scanline-disparity matching strategy (plane-sweep cost volume).

TPU-native re-design of the legacy ``STRATEGY_USE_HORIZ_DISPARITY`` path
(legacy/SfMToyLib_Old/FeatureMatching.cpp:340-399): the legacy code runs
``cv::StereoSGBM`` on a roughly-rectified pair, converts every valid
disparity pixel into a left->right point match, and keeps matches whose
disparity is valid in both directions.

Design: SGBM's per-scanline dynamic-programming aggregation is a serial
recurrence — a poor fit for the VPU. The TPU formulation is a dense
plane-sweep: the D-deep cost volume is D shifted ZSAD comparisons (one
elementwise op per hypothesis, box-aggregated with separable convolutions),
winner-take-all argmin with parabolic sub-pixel refinement, a uniqueness
gate, and a left-right consistency check done by re-indexing the SAME cost
volume from the right image's frame (C_R(x', d) = C_L(x' + d, d) — no
second sweep needed). Everything is fixed-shape dense array work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpusfm.features.detect import _bilinear
from tpusfm.types import Matches

_BIG = 1e9


def _box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = jnp.ones((2 * radius + 1,), jnp.float32) / (2 * radius + 1)
    x = img[None, None]
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, -1, 1), (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, k.reshape(1, 1, 1, -1), (1, 1), "SAME")
    return x[0, 0]


def disparity_map(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    *,
    max_disparity: int = 64,
    block_radius: int = 3,
    uniqueness: float = 0.95,
    lr_threshold: float = 1.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Left-image disparity (H, W) + validity mask (H, W).

    Convention matches StereoSGBM: x_right = x_left - d, d in [0, D).
    Cost is zero-mean SAD over a (2r+1)^2 block (robust to the exposure
    differences the legacy SGBM's pre-filter handles).
    """
    h, w = img_l.shape
    mu_l = _box_filter(img_l, block_radius)
    mu_r = _box_filter(img_r, block_radius)
    zl = img_l - mu_l
    zr = img_r - mu_r

    def cost_at(d):
        # right image shifted right by d: sample zr at x - d
        shifted = jnp.roll(zr, d, axis=1)
        # columns x < d have no valid counterpart
        c = _box_filter(jnp.abs(zl - shifted), block_radius)
        col = jnp.arange(w)[None, :]
        return jnp.where(col >= d, c, _BIG)

    vol = jnp.stack([cost_at(d) for d in range(max_disparity)], axis=0)  # (D, H, W)

    best = jnp.argmin(vol, axis=0)                                   # (H, W)
    cmin = jnp.min(vol, axis=0)
    # uniqueness: best must beat the runner-up (outside +-1 disparity)
    dis = jnp.arange(max_disparity)[:, None, None]
    masked = jnp.where(jnp.abs(dis - best[None]) <= 1, _BIG, vol)
    c2 = jnp.min(masked, axis=0)
    unique = cmin <= uniqueness * c2

    # parabolic sub-pixel around the winner
    b = jnp.clip(best, 1, max_disparity - 2)
    cm = jnp.take_along_axis(vol, (b - 1)[None], axis=0)[0]
    c0 = jnp.take_along_axis(vol, b[None], axis=0)[0]
    cp = jnp.take_along_axis(vol, (b + 1)[None], axis=0)[0]
    denom = cm - 2.0 * c0 + cp
    off = jnp.clip(0.5 * (cm - cp) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom),
                   -0.5, 0.5)
    disp = best.astype(jnp.float32) + jnp.where(best == b, off, 0.0)

    # left-right consistency from the same volume: the right image's
    # disparity at x' is argmin_d vol[d, y, x' + d]
    col = jnp.arange(w)[None, None, :]
    xr = jnp.clip(col + dis, 0, w - 1)
    vol_r = jnp.take_along_axis(vol, jnp.broadcast_to(xr, vol.shape), axis=2)
    best_r = jnp.argmin(vol_r, axis=0)                               # (H, W) right frame
    # check |d_L(x) - d_R(x - d_L(x))| <= lr_threshold
    xl = jnp.arange(w)[None, :]
    xr_of_l = jnp.clip((xl - best).astype(jnp.int32), 0, w - 1)
    d_r = jnp.take_along_axis(best_r, xr_of_l, axis=1)
    lr_ok = jnp.abs(disp - d_r.astype(jnp.float32)) <= lr_threshold

    valid = unique & lr_ok & (cmin < _BIG) & (best > 0) & (best < max_disparity - 1)
    return disp, valid


def match_pair_disparity(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    feats1_xy: jnp.ndarray,
    feats1_valid: jnp.ndarray,
    feats2_xy: jnp.ndarray,
    feats2_valid: jnp.ndarray,
    *,
    max_disparity: int = 64,
    assoc_radius: float = 3.0,
    max_matches: int = 1024,
) -> Matches:
    """Disparity-strategy matching of one pair -> fixed-capacity Matches.

    Mirrors the legacy flow (FeatureMatching.cpp:360-399): every left
    keypoint with a valid disparity maps to (x - d, y) in the right view
    and is associated to the nearest right keypoint; right keypoints may
    be claimed once (best association wins).
    """
    disp, dvalid = disparity_map(img1, img2, max_disparity=max_disparity)
    fx = feats1_xy[:, 0]
    fy = feats1_xy[:, 1]
    d = _bilinear(disp, fy, fx)
    dv = _bilinear(dvalid.astype(jnp.float32), fy, fx) > 0.5
    endpoints = jnp.stack([fx - d, fy], axis=1)
    tracked = feats1_valid & dv

    d2 = jnp.sum((endpoints[:, None, :] - feats2_xy[None, :, :]) ** 2, axis=2)
    d2 = jnp.where(feats2_valid[None, :], d2, _BIG)
    best_d2 = jnp.min(d2, axis=1)
    right = jnp.argmin(d2, axis=1)
    best = jnp.sqrt(best_d2)
    ok = tracked & (best <= assoc_radius)

    f2 = feats2_xy.shape[0]
    score = jnp.where(ok, -best, -jnp.inf)
    winner = jnp.full((f2,), -jnp.inf).at[right].max(score)
    is_winner = ok & (score >= winner[right])

    k = min(max_matches, int(feats1_xy.shape[0]))
    sel_score, sel = jax.lax.top_k(jnp.where(is_winner, -best, -jnp.inf), k)
    pad = max_matches - k
    if pad:
        sel_score = jnp.concatenate([sel_score, jnp.full((pad,), -jnp.inf)])
        sel = jnp.concatenate([sel, jnp.zeros((pad,), sel.dtype)])
    sel_ok = jnp.isfinite(sel_score)
    left = jnp.where(sel_ok, sel, -1).astype(jnp.int32)
    rsel = jnp.where(sel_ok, right[sel], -1).astype(jnp.int32)
    return Matches(
        idx=jnp.stack([left, rsel], axis=1),
        dist=jnp.where(sel_ok, -sel_score, _BIG).astype(jnp.float32),
        valid=sel_ok,
    )
