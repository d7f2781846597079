"""Keypoint / epipolar-match visual debug tool.

TPU-native equivalent of the reference's standalone DrawKeypoints app
(legacy/DrawKeypoints.cpp:14-85): with one image it detects blob
keypoints (the reference uses SURF minHessian=400) and writes
``<image>_keypoints.png``; with two images it detects + matches float
descriptors, filters the matches through an epipolar (E-matrix) RANSAC
consensus (the reference's GetFundamentalMat re-filter), and writes a
side-by-side match overlay.

Usage:
  python -m tpusfm.tools.draw_keypoints <image1> [image2]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or len(argv) > 2:
        print(f"USAGE: python -m tpusfm.tools.draw_keypoints <image1> [image2]")
        return 0

    from tpusfm.features import match_pair
    from tpusfm.features.blob import extract_blob_features
    from tpusfm.io.images import load_image
    from tpusfm.viz import draw_keypoints, draw_matches

    gray1, _ = load_image(argv[0])
    # reference writes next to the input (DrawKeypoints.cpp:83); write to
    # the working directory instead so read-only datasets stay untouched
    import os

    out_path = os.path.basename(argv[0]) + "_keypoints.png"

    if len(argv) == 1:
        f = extract_blob_features(jnp.asarray(gray1)[None], max_features=1024)
        draw_keypoints(out_path, gray1, np.asarray(f.xy[0]), np.asarray(f.valid[0]))
        print(f"{int(np.asarray(f.valid).sum())} keypoints -> {out_path}")
        return 0

    gray2, _ = load_image(argv[1])
    if gray2.shape != gray1.shape:
        print("error: images must have identical dimensions")
        return 1
    f = extract_blob_features(jnp.asarray(np.stack([gray1, gray2])), max_features=1024)
    m = match_pair(f.desc[0], f.valid[0], f.desc[1], f.valid[1],
                   ratio=0.8, metric="l2", max_matches=1024)
    li = np.maximum(np.asarray(m.idx[:, 0]), 0)
    ri = np.maximum(np.asarray(m.idx[:, 1]), 0)
    uv1 = np.asarray(f.xy[0])[li]
    uv2 = np.asarray(f.xy[1])[ri]
    valid = np.asarray(m.valid)

    # epipolar re-filter (role of GetFundamentalMat in DrawKeypoints.cpp:71)
    from tpusfm.geometry.essential import epipolar_inliers

    h, w = gray1.shape
    focal = float(max(h, w))  # mock K (legacy MultiCameraDistance.cpp:79-89)
    K = jnp.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], jnp.float32)
    inl = np.asarray(epipolar_inliers(
        jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.asarray(valid), K, jnp.linalg.inv(K),
        threshold_px=3.0, hypotheses=256))
    keep = valid & inl
    draw_matches(out_path, gray1, gray2, uv1, uv2, keep)
    print(f"{int(valid.sum())} matches, {int(keep.sum())} epipolar inliers -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
