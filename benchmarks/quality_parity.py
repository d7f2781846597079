"""Quality parity at the reference's feature operating point.

The reference runs 5000 ORB keypoints/image (SfM2DFeatureUtilities.cpp:39).
This records crazyhorse reconstruction quality at our matched operating
point (5120 = the MXU tile multiple) against the 2048-feature default:
point count, registered cameras, mean reprojection error, and wall time —
written to QUALITY.json at the repo root for the record (VERDICT r1 §7).

Usage: python -m benchmarks.quality_parity  (runs on the default backend)
"""
from __future__ import annotations

import json
import os
import time

DATASET = "/root/reference/dataset/crazyhorse"


def run_at(n_features: int, max_matches: int) -> dict:
    from tpusfm import SfMConfig
    from tpusfm.io import load_image_directory
    from tpusfm.pipeline import SfMPipeline

    cfg = SfMConfig(downscale=1.0, console_debug_level=5,
                    max_features=n_features, max_matches=max_matches,
                    engine_point_capacity=4096)
    imgs = load_image_directory(DATASET, cfg.downscale)
    pipe = SfMPipeline(imgs.gray, cfg, images_rgb=imgs.rgb)
    pipe.run()          # cold (compile)
    pipe.reset()
    t0 = time.perf_counter()
    rec = pipe.run()
    warm = time.perf_counter() - t0
    return {
        "max_features": n_features,
        "points": rec.num_points,
        "cameras": f"{int(rec.pose_valid.sum())}/{imgs.num_views}",
        "mean_reprojection_px": round(rec.mean_reprojection_error, 4),
        "warm_seconds": round(warm, 3),
        "mean_track_length": round(float((rec.obs >= 0).sum(1).mean()), 3),
    }


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    rows = [run_at(2048, 1024), run_at(5120, 2048)]
    out = {"metric": "crazyhorse_quality_parity", "configs": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "QUALITY.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
