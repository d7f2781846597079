"""BASELINE config 3 stress run: 4K-class images (Herz-Jesu-P25 regime).

Renders the Strecha-format textured fixture at 3072x2048 (the
Herz-Jesu-P25 resolution) with proportionally scaled focal and real
radial distortion, then runs the FULL incremental pipeline at
downscale=1 and the reference's 5000-feature operating point (5120 =
MXU tile multiple). Records per-stage wall time, ATE vs the fixture's
ground-truth cameras, and a warm re-run — the stage the reference
offloads to CUDA (GPUSURFFeatureMatcher.cpp:100-124) is exactly the
detector/matcher throughput this config stresses.

Usage:  JAX_PLATFORMS='' python benchmarks/stress4k.py [--views 7]
Writes STRESS4K.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=7)
    ap.add_argument("--width", type=int, default=3072)
    ap.add_argument("--height", type=int, default=2048)
    ap.add_argument("--features", type=int, default=5120)
    ap.add_argument("--matches", type=int, default=2048)
    ap.add_argument("--dir", default="/tmp/strecha4k")
    ap.add_argument("--out", default="STRESS4K.json")
    args = ap.parse_args()

    import jax

    from benchmarks.strecha_eval import load_strecha_camera
    from benchmarks.strecha_fixture import make_fixture
    from tpusfm import SfMConfig
    from tpusfm.eval import ate_rmse, rotation_errors_deg
    from tpusfm.io import load_image_directory
    from tpusfm.pipeline import SfMPipeline
    from tpusfm.types import Intrinsics

    t0 = time.time()
    if not os.path.isdir(args.dir) or len(
            [f for f in os.listdir(args.dir) if f.endswith(".camera")]) \
            != args.views:
        make_fixture(args.dir, n_views=args.views, h=args.height,
                     w=args.width, focal=520.0 * args.width / 512.0,
                     dist=(-0.20, 0.05, 0.0))
    render_s = time.time() - t0
    print(f"# fixture at {args.width}x{args.height} ready ({render_s:.1f}s)",
          flush=True)

    cam_files = sorted(f for f in os.listdir(args.dir)
                       if f.endswith(".camera"))
    gt = [load_strecha_camera(os.path.join(args.dir, f)) for f in cam_files]
    gt_K = gt[0][0]
    gt_poses = np.stack([g[2] for g in gt])
    k1, k2, k3 = gt[0][1]

    t1 = time.time()
    imgs = load_image_directory(args.dir, 1.0)
    load_s = time.time() - t1
    intr = Intrinsics.create(0.5 * (gt_K[0, 0] + gt_K[1, 1]),
                             gt_K[0, 2], gt_K[1, 2],
                             dist=[k1, k2, 0.0, 0.0, k3])
    # 6 pyramid levels (1.2^5 = 2.5x) on top of the pixel-scale texture
    # detail: 4K images carry features across the whole scale band. The
    # FAST threshold comes down with the fixture's fine-octave contrast
    # (band-limited lattice noise carries ~3x weaker pixel-scale
    # gradients than photographs; 8/255 selects the same corner
    # population the default 20/255 selects on camera images).
    cfg = SfMConfig(downscale=1.0, ba_share_focal=False,
                    max_features=args.features, max_matches=args.matches,
                    pyramid_levels=6, fast_threshold=8.0,
                    engine_point_capacity=8192, console_debug_level=1)

    t2 = time.time()
    pipe = SfMPipeline(imgs.gray, cfg, images_rgb=imgs.rgb, intrinsics=intr)
    rec = pipe.run()
    cold_s = time.time() - t2

    pipe.reset()
    t3 = time.time()
    rec = pipe.run()
    warm_s = time.time() - t3

    sel = rec.pose_valid
    ate = ate_rmse(rec.poses[sel], gt_poses[sel])
    rot = rotation_errors_deg(rec.poses[sel], gt_poses[sel])
    out = {
        "config": f"BASELINE config 3 stress: {args.views} views @ "
                  f"{args.width}x{args.height}, {args.features} features",
        "device": jax.devices()[0].platform,
        "cameras": f"{int(sel.sum())}/{len(sel)}",
        "points": int(rec.num_points),
        "mean_reprojection_px": round(float(rec.mean_reprojection_error), 3),
        "ate_rmse": round(float(ate), 4),
        "median_rotation_error_deg": round(float(np.median(rot)), 3),
        "cold_s": round(cold_s, 2),
        "warm_s": round(warm_s, 2),
        "warm_frames_per_s": round(args.views / warm_s, 3),
        "load_s": round(load_s, 2),
        "stage_s": {k: round(v, 3) for k, v in rec.stats.items()
                    if isinstance(v, float)},
    }
    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    json.dump(out, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
