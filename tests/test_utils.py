"""Profiling utils + visual-debug channel tests."""
import os
import time

import numpy as np

from tpusfm.utils import profiling


def test_profile_accumulates():
    profiling.reset()
    with profiling.profile("stage_a"):
        time.sleep(0.01)
    with profiling.profile("stage_a"):
        time.sleep(0.01)
    rep = profiling.report()
    assert rep["stage_a"]["calls"] == 2
    assert rep["stage_a"]["total_s"] >= 0.02


def test_visual_debug_dumps(tmp_path):
    from tests.synthetic_scene import make_scene
    from tpusfm import SfMConfig
    from tpusfm.pipeline import SfMPipeline
    from tpusfm.types import Intrinsics

    imgs, poses, K, dots = make_scene(n_views=3, n_dots=200, h=120, w=160)
    cfg = SfMConfig(max_features=512, max_matches=256, console_debug_level=5,
                    visual_debug_level=1, debug_dir=str(tmp_path / "dbg"),
                    epipolar_prune=False)
    pipe = SfMPipeline(imgs, cfg,
                       intrinsics=Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2])))
    pipe.extract()
    pipe.match()
    files = os.listdir(cfg.debug_dir)
    assert any(f.startswith("matches_") for f in files)
    assert any(f.startswith("keypoints_") for f in files)
