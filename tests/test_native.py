"""Native C++ runtime tests (csrc/ via ctypes). Skip if no toolchain."""
import numpy as np
import pytest

from tpusfm import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_image_loader_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    out = native.load_images([p], 60, 80)
    assert out is not None
    rgb, gray = out
    np.testing.assert_array_equal(rgb[0], img)
    expected = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]) / 255.0
    np.testing.assert_allclose(gray[0], expected.astype(np.float32), atol=1e-6)


def test_native_image_resize(tmp_path):
    from PIL import Image

    grad = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (64, 1, 3))
    p = str(tmp_path / "g.jpg")
    Image.fromarray(grad).save(p, quality=95)
    out = native.load_images([p], 32, 32)
    assert out is not None
    rgb, gray = out
    # downscaled gradient stays monotone left->right
    row = gray[0][16]
    assert (np.diff(row) >= -0.02).all()


def test_native_insert_points_matches_python():
    cap, V, F = 64, 3, 32
    xyz = np.zeros((cap, 3), np.float32)
    obs = np.full((cap, V), -1, np.int32)
    f2p = np.full((V, F), -1, np.int32)
    new_xyz = np.arange(12, dtype=np.float32).reshape(4, 3)
    fi = np.array([1, 2, 3, 4], np.int32)
    fj = np.array([5, 6, 7, 8], np.int32)
    n, appended, merged = native.insert_points(xyz, obs, f2p, 0, 0, 1, new_xyz, fi, fj)
    assert (n, appended, merged) == (4, 4, 0)
    assert (obs[:4, 0] == fi).all() and (obs[:4, 1] == fj).all()
    # second batch: one attaches via view-0 feature, one brand-new
    n2, appended2, merged2 = native.insert_points(
        xyz, obs, f2p, n, 0, 2,
        np.ones((2, 3), np.float32),
        np.array([1, 9], np.int32), np.array([10, 11], np.int32))
    assert (n2, appended2, merged2) == (5, 1, 1)
    assert obs[0, 2] == 10  # attached observation
    assert f2p[2, 10] == 0


def test_native_find_2d3d_matches_python():
    V, F, M = 3, 16, 8
    f2p = np.full((V, F), -1, np.int32)
    f2p[1, 4] = 7  # view 1 feature 4 -> point 7
    f2p[2, 5] = 3
    pairs = [(0, 1), (0, 2), (1, 2)]
    pair_row = np.full((V * V,), -1, np.int32)
    for p, (a, b) in enumerate(pairs):
        pair_row[a * V + b] = p
    match_idx = np.full((3, M, 2), -1, np.int32)
    match_valid = np.zeros((3, M), bool)
    # pair (0,1): view0 feat 2 <-> view1 feat 4 (claimed by point 7)
    match_idx[0, 0] = (2, 4)
    match_valid[0, 0] = True
    # pair (0,2): view0 feat 9 <-> view2 feat 5 (point 3)
    match_idx[1, 0] = (9, 5)
    match_valid[1, 0] = True
    feats, pts = native.find_2d3d(f2p, 0, {1, 2}, pair_row, match_idx, match_valid)
    assert dict(zip(feats.tolist(), pts.tolist())) == {2: 7, 9: 3}
