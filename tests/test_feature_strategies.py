"""Float-descriptor (SURF-path) and disparity (SGBM-path) strategy tests.

Synthetic-imagery fixtures in the reference's style (SfMUnitTests.cpp):
known transforms between views, quantitative recovery assertions.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpusfm.features import l2_distance_matrix, match_pair
from tpusfm.features.blob import extract_blob_features
from tpusfm.features.stereo import disparity_map, match_pair_disparity


def blob_image(h=240, w=320, n_dots=200, seed=0, shift=0.0):
    """Gaussian blobs (multi-size) — blob-detector-friendly scene."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    ys = rng.uniform(30, h - 30, n_dots)
    xs = rng.uniform(30, w - 30, n_dots)
    sig = rng.uniform(1.5, 4.0, n_dots)
    vals = rng.uniform(0.4, 1.0, n_dots)
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x, s, v in zip(ys, xs, sig, vals):
        img += v * np.exp(-(((yy - y) ** 2 + (xx - x - shift) ** 2) / (2 * s**2)))
    return np.clip(img, 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def blobs():
    return blob_image()


def test_blob_detector_finds_keypoints(blobs):
    f = extract_blob_features(jnp.asarray(blobs)[None], max_features=512)
    n = int(jnp.sum(f.valid))
    assert n > 80, f"expected >80 blob keypoints, got {n}"
    xy = np.asarray(f.xy[0])[np.asarray(f.valid[0])]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    # descriptors are L2-normalized floats
    d = np.asarray(f.desc[0])[np.asarray(f.valid[0])]
    norms = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_l2_distance_matrix_exact():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((24, 64)).astype(np.float32)
    b = rng.standard_normal((40, 64)).astype(np.float32)
    d = np.asarray(l2_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)


def test_blob_match_translated(blobs):
    """Blob features must match across a pure translation (legacy GPU-SURF
    acceptance: kNN2 + 0.7 ratio, GPUSURFFeatureMatcher.cpp:100-124)."""
    moved = blob_image(shift=6.0)
    f = extract_blob_features(jnp.asarray(np.stack([blobs, moved])), max_features=512)
    m = match_pair(f.desc[0], f.valid[0], f.desc[1], f.valid[1],
                   ratio=0.7, metric="l2", max_matches=512)
    idx = np.asarray(m.idx)[np.asarray(m.valid)]
    assert len(idx) > 40, f"only {len(idx)} SURF-path matches"
    xy1 = np.asarray(f.xy[0])[idx[:, 0]]
    xy2 = np.asarray(f.xy[1])[idx[:, 1]]
    dx = xy2[:, 0] - xy1[:, 0]
    dy = xy2[:, 1] - xy1[:, 1]
    # the dominant flow must be the injected translation
    assert abs(np.median(dx) - 6.0) < 1.0, f"median dx {np.median(dx)}"
    assert abs(np.median(dy)) < 1.0, f"median dy {np.median(dy)}"


def _stereo_pair(h=96, w=160, d_true=7, seed=3):
    """Right image = left shifted LEFT by d_true (x_r = x_l - d)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (h, w + d_true)).astype(np.float32)
    # smooth a little so matching has gradients but stays textured
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for ax in (0, 1):
        base = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), ax, base)
    # left(x) = base(x), right(x) = base(x + d): the scene point at left
    # column x appears at right column x - d  (x_r = x_l - d).
    left = base[:, :w]
    right = base[:, d_true:]
    return left.astype(np.float32), right.astype(np.float32)


def test_disparity_map_constant_shift():
    left, right = _stereo_pair(d_true=7)
    disp, valid = disparity_map(jnp.asarray(left), jnp.asarray(right),
                                max_disparity=32)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    # interior pixels only
    v = valid[10:-10, 40:-10]
    d = disp[10:-10, 40:-10]
    assert v.mean() > 0.5, f"only {v.mean():.2f} of pixels valid"
    err = np.abs(d[v] - 7.0)
    assert np.median(err) < 0.5, f"median disparity error {np.median(err)}"


def test_match_pair_disparity_translated():
    left, right = _stereo_pair(d_true=7)
    # keypoints on a grid in the valid interior
    ys, xs = np.mgrid[16:80:8, 48:144:8]
    xy1 = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    xy2 = xy1.copy()
    xy2[:, 0] -= 7.0
    m = match_pair_disparity(
        jnp.asarray(left), jnp.asarray(right),
        jnp.asarray(xy1), jnp.ones((len(xy1),), bool),
        jnp.asarray(xy2), jnp.ones((len(xy2),), bool),
        max_disparity=32, max_matches=256)
    idx = np.asarray(m.idx)[np.asarray(m.valid)]
    assert len(idx) > len(xy1) * 0.5, f"only {len(idx)} disparity matches"
    frac_correct = np.mean(idx[:, 0] == idx[:, 1])
    assert frac_correct > 0.9, f"correct-association fraction {frac_correct}"


def test_min_eig_detector_score():
    """Shi-Tomasi ranking (legacy goodFeaturesToTrack seed) finds corners."""
    from tpusfm.features.detect import extract_features_single

    img = blob_image(seed=5)
    f = extract_features_single(jnp.asarray(img), max_features=256,
                                pyramid_levels=1, score_kind="min_eig")
    assert int(jnp.sum(f.valid)) > 50


def test_dense_rigid_seeding_rescues_large_baseline():
    """Rigid-transform flow seeding (FeatureMatching.cpp:229-259): a
    ~120 px global shift is beyond the pyramidal LK capture range from a
    zero flow init, but the similarity estimated from ratio-test feature
    matches seeds the flow and the dense strategy recovers the pair."""
    from tpusfm.features import extract_features
    from tpusfm.features.dense import match_pair_dense

    img1 = blob_image(seed=5)
    img2 = blob_image(seed=5, shift=120.0)      # same scene, 120 px shift
    feats = extract_features(jnp.asarray(np.stack([img1, img2])),
                             max_features=512, pyramid_levels=3)
    args = (jnp.asarray(img1), jnp.asarray(img2),
            feats.xy[0], feats.valid[0], feats.xy[1], feats.valid[1])
    unseeded = match_pair_dense(*args, max_matches=512,
                                seed_with_features=False)
    seeded = match_pair_dense(*args, max_matches=512,
                              feats1_desc=feats.desc[0],
                              feats2_desc=feats.desc[1])
    n_un = int(np.asarray(unseeded.valid).sum())
    n_se = int(np.asarray(seeded.valid).sum())
    assert n_se > max(3 * n_un, 60), (n_un, n_se)
    # matched displacement must recover the true 120 px shift
    mi = np.asarray(seeded.idx)[np.asarray(seeded.valid)]
    d = (np.asarray(feats.xy[1])[mi[:, 1]]
         - np.asarray(feats.xy[0])[mi[:, 0]])
    assert abs(np.median(d[:, 0]) - 120.0) < 2.0
    assert abs(np.median(d[:, 1])) < 2.0
