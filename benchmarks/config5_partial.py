"""BASELINE config 5 probe: 5000-image city-scale sequence, partial run.

A full incremental reconstruction at V=5000 is hours of wall clock; what
config 5 has to demonstrate is that the COLLECTION-SCALE LAYOUT HOLDS at
V=5000, window=8: ~40k pairs through the windowed matcher, a ~10^6-node
track graph through the pointer-jumping union-find, and a global
COO Schur-CG BA over the full observation list (sharded over the mesh
when one is given). This script runs exactly those stages and records
per-stage wall time, working-set sizes, and BA iterations/s:

  1. render V frames of the textured-orbit fixture (reused from config 4,
     5000 views around the same ring — consecutive-view baselines shrink
     10x, the matching/tracking regime BASELINE config 5 stresses),
  2. detect + windowed-match + epipolar-prune on the device,
  3. build the global track graph,
  4. multi-view triangulate every track from ground-truth poses and run
     ONE deep global Huber BA over the full COO system (poses perturbed,
     so the solve does real work), asserting it improves the cost.

Stage 4 initializes from ground truth rather than incremental
registration — this is a SCALE/THROUGHPUT probe of the long-dimension
data structures (SURVEY §5), not a quality benchmark; config 4
(collection_e2e.py) covers end-to-end quality.

Usage:
    JAX_PLATFORMS='' python benchmarks/config5_partial.py            # TPU
    python benchmarks/config5_partial.py --views 1000                # smoke
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=5000)
    ap.add_argument("--features", type=int, default=1024)
    ap.add_argument("--matches", type=int, default=512)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--mesh", type=int, default=0)
    ap.add_argument("--ba-iters", type=int, default=20)
    ap.add_argument("--out", default="CONFIG5_PARTIAL.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.collection_fixture import make_collection_textured
    from tpusfm import SfMConfig
    from tpusfm.pipeline import CollectionPipeline
    from tpusfm.types import Intrinsics

    stage = {}
    t0 = time.time()
    imgs, poses_gt, K = make_collection_textured(n_views=args.views)
    stage["render_s"] = round(time.time() - t0, 2)
    print(f"# rendered {args.views} views in {stage['render_s']}s", flush=True)

    mesh = None
    if args.mesh > 1:
        from tpusfm.dist import make_mesh

        mesh = make_mesh(args.mesh)

    cfg = SfMConfig(
        max_features=args.features, max_matches=args.matches,
        collection_window=args.window, collection_wraparound=True,
        ba_share_focal=False, console_debug_level=1,
        ba_max_iterations=args.ba_iters)
    intr = Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))
    pipe = CollectionPipeline(imgs, cfg, intrinsics=intr, mesh=mesh)

    pipe.extract()
    pipe.match()          # includes the epipolar prune stage
    pipe.build_tracks()
    stage.update({k: round(v, 2) for k, v in pipe._timings.items()})

    # ---- stage 4: triangulate every track from GT poses, one global BA
    t1 = time.time()
    pipe.poses = poses_gt.copy()
    pipe.pose_valid[:] = True
    n_tri = pipe._retriangulate()
    stage["triangulate_s"] = round(time.time() - t1, 2)
    print(f"# triangulated {n_tri} tracks ({stage['triangulate_s']}s)",
          flush=True)

    rng = np.random.default_rng(0)
    pipe.poses = (poses_gt + 0.002 * rng.standard_normal(
        poses_gt.shape)).astype(np.float32)
    t2 = time.time()
    pipe._ba(np.arange(pipe.V), global_ba=True, final=True)
    stage["global_ba_s"] = round(time.time() - t2, 2)
    ba_iters = pipe._ba_iters

    alive = int(pipe.obs_alive.sum())
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "config": f"BASELINE config 5 partial probe ({args.views} views)",
        "device": f"{jax.devices()[0].platform} x "
                  f"{mesh.devices.size if mesh is not None else 1}",
        "views": args.views,
        "pairs": int(len(pipe.pairs)),
        "tracks": int(pipe.T),
        "tracks_triangulated": int(pipe.track_ok.sum()),
        "observations": alive,
        "ba_iterations": int(ba_iters),
        "ba_iterations_per_s": round(ba_iters / max(stage["global_ba_s"], 1e-9), 2),
        "mean_reprojection_px": float(pipe.mean_reprojection_error()),
        "peak_host_rss_gb": round(rss_gb, 2),
        "stage_s": stage,
        "total_s": round(time.time() - t0, 2),
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
