"""Visualization output tests (overlays + HTML viewer)."""
import os

import numpy as np

from tpusfm.viz import draw_keypoints, draw_matches, draw_reprojections, export_html_viewer


def test_overlays(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (120, 160)).astype(np.float32)
    xy = np.random.default_rng(1).uniform(10, 100, (40, 2)).astype(np.float32)
    p1 = str(tmp_path / "kp.png")
    draw_keypoints(p1, img, xy)
    p2 = str(tmp_path / "m.png")
    draw_matches(p2, img, img, xy, xy + 3.0)
    p3 = str(tmp_path / "r.png")
    draw_reprojections(p3, img, xy, xy + 1.5)
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 500


def test_html_viewer(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    rgb = (rng.uniform(0, 255, (500, 3))).astype(np.uint8)
    poses = np.tile(np.concatenate([np.eye(3), np.zeros((3, 1))], 1), (3, 1, 1)).astype(np.float32)
    valid = np.array([True, True, False])
    p = str(tmp_path / "v.html")
    export_html_viewer(p, xyz, rgb, poses, valid)
    html = open(p).read()
    assert "500 points" in html and "2 cameras" in html
    assert html.count("rgb(") >= 1


def test_sor_filter_removes_outliers():
    from tpusfm.viz import sor_filter, sor_filter_mask

    rng = np.random.default_rng(2)
    dense = rng.normal(0, 0.5, (400, 3)).astype(np.float32)
    outliers = rng.uniform(50, 60, (12, 3)).astype(np.float32)
    pts = np.concatenate([dense, outliers])
    mask = sor_filter_mask(pts, mean_k=50, stddev_mult=1.0)
    # every far outlier removed, vast majority of the dense blob kept
    assert not mask[400:].any()
    assert mask[:400].sum() >= 360

    colors = np.tile(np.arange(len(pts))[:, None], (1, 3)).astype(np.uint8)
    fpts, fcol = sor_filter(pts, colors)
    assert fpts.shape[0] == fcol.shape[0] == mask.sum()


def test_sor_filter_respects_valid_and_small_clouds():
    from tpusfm.viz import sor_filter_mask

    pts = np.random.default_rng(0).normal(size=(30, 3)).astype(np.float32)
    valid = np.ones(30, bool)
    valid[5] = False
    # fewer valid points than mean_k: no-op passthrough of valid mask
    mask = sor_filter_mask(pts, valid, mean_k=50)
    assert (mask == valid).all()


def test_voxel_grid_filter():
    from tpusfm.viz import voxel_grid_filter

    pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.03, 0.02], [5.0, 5.0, 5.0]], np.float32)
    out = voxel_grid_filter(pts, leaf_size=0.1)
    assert out.shape == (2, 3)
    near = out[np.argmin(np.abs(out).sum(1))]
    np.testing.assert_allclose(near, pts[:2].mean(0), atol=1e-5)


def test_live_viewer_streams_frames(tmp_path):
    """LiveViewer (L14 completion): every listener update appends a frame
    to frames.json and rewrites the timeline HTML atomically."""
    import json

    import numpy as np

    from tpusfm.viz import LiveViewer

    html = str(tmp_path / "live.html")
    v = LiveViewer(html)
    rng = np.random.default_rng(0)
    for k in range(3):
        n = 50 + 20 * k
        xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
        poses = np.tile(np.eye(3, 4, dtype=np.float32), (2 + k, 1, 1))
        v.update(xyz, rgb, poses, np.ones(2 + k, bool))
    frames = json.load(open(tmp_path / "frames.json"))
    assert len(frames) == 3
    assert len(frames[2]["cams"]) == 4
    page = open(html).read()
    assert "seek" in page and str(len(frames[0]["pts"])) and "LIVE" in page


def test_listeners_route_to_classic_path():
    """Observers need per-view host snapshots, so a pipeline with a
    registered listener must not take the fused device path."""
    import numpy as np

    from tpusfm import SfMConfig
    from tpusfm.pipeline import SfMPipeline

    pipe = SfMPipeline(np.zeros((3, 32, 32), np.float32),
                       SfMConfig(max_features=16, max_matches=8))
    assert pipe._fused_applicable()
    pipe.add_listener(lambda *a: None)
    assert not pipe._fused_applicable()
