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
