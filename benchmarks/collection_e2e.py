"""End-to-end collection-scale reconstruction bench (BASELINE config 4).

Reconstructs a synthetic N-view orbit collection (default 500 images)
with the collection pipeline: windowed pair matching (sharded over the
mesh when devices > 1), global track graph, PnP registration, sliding
local COO BA, periodic + final global COO BA. Writes a BENCH-style JSON
artifact with frames/s, BA iters/s, registered cameras, reprojection
error, and ATE vs the fixture's ground-truth orbit.

Usage:
    JAX_PLATFORMS='' python benchmarks/collection_e2e.py            # TPU
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/collection_e2e.py --mesh 8                # CPU mesh
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
    ap.add_argument("--views", type=int, default=500)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--features", type=int, default=1024)
    ap.add_argument("--matches", type=int, default=512)
    ap.add_argument("--window", type=int, default=6)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard matching + global BA over N devices")
    ap.add_argument("--out", default="COLLECTION_E2E.json")
    args = ap.parse_args()

    import jax

    from benchmarks.collection_fixture import make_collection_textured
    from tests.synthetic_scene import camera_centers, umeyama_alignment
    from tpusfm import SfMConfig
    from tpusfm.pipeline import CollectionPipeline
    from tpusfm.types import Intrinsics

    t0 = time.perf_counter()
    imgs, poses_gt, K = make_collection_textured(
        n_views=args.views, h=args.height, w=args.width)
    render_s = time.perf_counter() - t0
    print(f"# rendered {args.views} views in {render_s:.1f}s", flush=True)

    mesh = None
    if args.mesh > 1:
        from tpusfm.dist import make_mesh

        mesh = make_mesh(args.mesh)

    cfg = SfMConfig(
        max_features=args.features, max_matches=args.matches,
        collection_window=args.window, collection_wraparound=True,
        collection_local_ba_cams=8, collection_global_ba_interval=50,
        ba_incremental_iterations=10, ba_max_iterations=75,
        ba_share_focal=False, min_point_count_for_homography=60,
        console_debug_level=1)
    intr = Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))

    t1 = time.perf_counter()
    pipe = CollectionPipeline(imgs, cfg, intrinsics=intr, mesh=mesh)
    rec = pipe.run()
    total_s = time.perf_counter() - t1

    pv = rec.pose_valid
    gt_c = camera_centers(poses_gt)[pv]
    est_c = camera_centers(rec.poses[pv])
    s, R, t = umeyama_alignment(est_c, gt_c)
    ate = float(np.sqrt(((gt_c - (s * est_c @ R.T + t)) ** 2).sum(1).mean()))

    fps = args.views / total_s
    ba_iters = int(rec.stats.get("ba_iters", 0))
    out = {
        "config": "synthetic 500-image collection (BASELINE config 4)",
        "device": f"{jax.devices()[0].platform} x "
                  f"{mesh.devices.size if mesh is not None else 1}",
        "views": args.views,
        "registered_cameras": int(pv.sum()),
        "points": int(rec.num_points),
        "observations": int(len(rec.obs_point)),
        "mean_reprojection_px": float(rec.mean_reprojection_error),
        "ate": ate,
        "gt_orbit_diameter": 12.0,
        "total_s": round(total_s, 2),
        "frames_per_s": round(fps, 3),
        "ba_iterations": ba_iters,
        "ba_iterations_per_s": round(ba_iters / max(
            rec.stats.get("solve_s", total_s), 1e-9), 2),
        "stage_s": {k: round(v, 2) for k, v in rec.stats.items()
                    if k.endswith("_s")},
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
