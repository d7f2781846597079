"""End-to-end pipeline tests on synthetic renders (CPU mesh).

The golden end-to-end analog of the reference's crazyhorse smoke run
(README.md:68) but fully synthetic: known poses + known structure, so
recovery is asserted quantitatively (ATE after similarity alignment).
"""
import numpy as np
import pytest

from tests.synthetic_scene import camera_centers, make_scene, umeyama_alignment
from tpusfm import SfMConfig
from tpusfm.pipeline import SfMPipeline
from tpusfm.types import Intrinsics


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_views=5, n_dots=400)


@pytest.fixture(scope="module")
def reconstruction(scene):
    imgs, poses, K, dots = scene
    cfg = SfMConfig(max_features=1024, max_matches=512, console_debug_level=5,
                    min_point_count_for_homography=60)
    intr = Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))
    pipe = SfMPipeline(imgs, cfg, intrinsics=intr)
    return pipe.run()


def test_registers_most_cameras(reconstruction):
    assert int(reconstruction.pose_valid.sum()) >= 4


def test_reprojection_error(reconstruction):
    assert reconstruction.mean_reprojection_error < 1.0


def test_camera_trajectory_ate(scene, reconstruction):
    imgs, poses, K, dots = scene
    sel = reconstruction.pose_valid
    if sel.sum() < 4:
        pytest.skip("needs >=4 registered cameras for a meaningful ATE")
    gt_c = camera_centers(poses[sel])
    est_c = camera_centers(reconstruction.poses[sel])
    s, R, t = umeyama_alignment(est_c, gt_c)
    ate = float(np.sqrt(np.mean(np.sum((gt_c - (s * (est_c @ R.T) + t)) ** 2, 1))))
    spread = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    assert ate < 0.2 * spread, f"ATE {ate:.3f} vs camera spread {spread:.3f}"


def test_point_cloud_sanity(scene, reconstruction):
    imgs, poses, K, dots = scene
    assert reconstruction.num_points > 100
    # every valid point must be observed by >= 2 views (a track)
    track_len = (reconstruction.obs >= 0).sum(1)
    assert (track_len >= 2).all()


def test_ply_export(tmp_path, reconstruction):
    prefix = str(tmp_path / "rec")
    reconstruction.save_ply(prefix)
    pts = open(prefix + "_points.ply").read()
    assert f"element vertex {reconstruction.num_points}" in pts
    cams = open(prefix + "_cameras.ply").read()
    assert "element edge" in cams


def test_select_points_sor(reconstruction):
    from tpusfm.viz import sor_filter_mask

    keep = sor_filter_mask(reconstruction.xyz)
    sub = reconstruction.select_points(keep)
    assert sub.num_points == int(keep.sum())
    assert sub.obs.shape[0] == sub.num_points
    assert sub.pose_valid.shape == reconstruction.pose_valid.shape


def test_cli_parser_flags():
    from tpusfm.cli import build_parser

    args = build_parser().parse_args(
        ["imgs", "--downscale", "2", "--sor-filter", "--pcd", "--html",
         "--matcher", "of", "--decomposition", "horn"])
    assert args.downscale == 2.0 and args.sor_filter and args.pcd
    assert args.matcher == "of" and args.decomposition == "horn"
