"""Feature detection + matching tests on synthetic imagery.

Mirrors the reference's synthetic-fixture strategy (SfMUnitTests.cpp): no
real image I/O; imagery is generated, the transform between views is known
exactly, and recovery is asserted quantitatively.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusfm.features import extract_features, match_pair, hamming_distance_matrix
from tpusfm.features.detect import extract_features_single


def random_dot_image(h=240, w=320, n_dots=300, seed=0):
    """Gaussian blobs at random positions — corner-rich synthetic scene."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    ys = rng.uniform(20, h - 20, n_dots)
    xs = rng.uniform(20, w - 20, n_dots)
    vals = rng.uniform(0.4, 1.0, n_dots)
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x, v in zip(ys, xs, vals):
        img += v * np.exp(-(((yy - y) ** 2 + (xx - x) ** 2) / (2 * 2.0**2)))
    return np.clip(img, 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def dots():
    return random_dot_image()


def test_detector_finds_keypoints(dots):
    f = extract_features_single(jnp.asarray(dots), max_features=512, pyramid_levels=2)
    n = int(jnp.sum(f.valid))
    assert n > 100, f"expected >100 keypoints, got {n}"
    xy = np.asarray(f.xy[0])[np.asarray(f.valid[0])]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240


def test_hamming_distance_matrix_exact():
    rng = np.random.default_rng(1)
    a = np.sign(rng.standard_normal((32, 256))).astype(np.float32)
    b = np.sign(rng.standard_normal((48, 256))).astype(np.float32)
    d = np.asarray(hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] * b[None, :, :]) < 0).sum(-1)
    np.testing.assert_array_equal(d, ref.astype(np.float32))


def test_self_match_identity(dots):
    """Matching an image against itself must be (nearly) the identity map."""
    f = extract_features_single(jnp.asarray(dots), max_features=512, pyramid_levels=2)
    m = match_pair(f.desc[0], f.valid[0], f.desc[0], f.valid[0], ratio=1.01, max_matches=512)
    idx = np.asarray(m.idx)[np.asarray(m.valid)]
    assert len(idx) > 100
    frac_identity = np.mean(idx[:, 0] == idx[:, 1])
    assert frac_identity > 0.95, f"self-match identity fraction {frac_identity}"


def test_translated_match_displacement(dots):
    """A 6/4 px shifted copy: matched keypoints must move by (6, 4)."""
    shifted = np.roll(dots, shift=(4, 6), axis=(0, 1))
    imgs = jnp.stack([jnp.asarray(dots), jnp.asarray(shifted)])
    f = extract_features(imgs, max_features=512, pyramid_levels=2)
    m = match_pair(f.desc[0], f.valid[0], f.desc[1], f.valid[1], max_matches=512)
    valid = np.asarray(m.valid)
    idx = np.asarray(m.idx)[valid]
    assert len(idx) > 50, f"only {len(idx)} matches"
    d = np.asarray(f.xy[1])[idx[:, 1]] - np.asarray(f.xy[0])[idx[:, 0]]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [6.0, 4.0], atol=0.75)
    inlier_frac = np.mean(np.linalg.norm(d - np.array([6.0, 4.0]), axis=1) < 2.0)
    assert inlier_frac > 0.7, f"translation-consistent match fraction {inlier_frac}"


def test_rotation_invariance(dots):
    """Steered BRIEF: a 15-deg rotated view should still match."""
    import scipy.ndimage as ndi

    rot = ndi.rotate(dots, 15.0, reshape=False, order=1).astype(np.float32)
    imgs = jnp.stack([jnp.asarray(dots), jnp.asarray(rot)])
    f = extract_features(imgs, max_features=512, pyramid_levels=2)
    m = match_pair(f.desc[0], f.valid[0], f.desc[1], f.valid[1], max_matches=512)
    valid = np.asarray(m.valid)
    idx = np.asarray(m.idx)[valid]
    assert len(idx) > 30, f"only {len(idx)} matches under 15-deg rotation"
    # ground-truth rotation about image center
    th = np.radians(-15.0)
    c, s = np.cos(th), np.sin(th)
    ctr = np.array([320 / 2 - 0.5, 240 / 2 - 0.5])
    p1 = np.asarray(f.xy[0])[idx[:, 0]] - ctr
    pred = np.stack([c * p1[:, 0] - s * p1[:, 1], s * p1[:, 0] + c * p1[:, 1]], 1) + ctr
    p2 = np.asarray(f.xy[1])[idx[:, 1]]
    err = np.linalg.norm(pred - p2, axis=1)
    assert np.median(err) < 2.5, f"median rotated-match error {np.median(err)}"
