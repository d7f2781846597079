"""Pyramidal LK optical-flow matcher tests (legacy OFFeatureMatcher parity)."""
import jax.numpy as jnp
import numpy as np

from tests.test_features import random_dot_image
from tpusfm.features import extract_features
from tpusfm.features.optical_flow import match_pair_optical_flow, track_points


def test_track_known_translation():
    img = random_dot_image(h=160, w=200, n_dots=150, seed=2)
    shifted = np.roll(img, shift=(3, 7), axis=(0, 1))
    f = extract_features(jnp.asarray(img)[None], max_features=256, pyramid_levels=1)
    pts = np.asarray(f.xy[0])[np.asarray(f.valid[0])][:100]
    endpoints, err = track_points(jnp.asarray(img), jnp.asarray(shifted), jnp.asarray(pts))
    good = np.asarray(err) <= 12.0
    assert good.mean() > 0.7, f"only {good.mean():.2f} tracked"
    flow = np.asarray(endpoints)[good] - pts[good]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [7.0, 3.0], atol=0.35)


def test_dense_flow_match_pair():
    from tpusfm.features.dense import match_pair_dense

    img = random_dot_image(h=160, w=200, n_dots=150, seed=5)
    shifted = np.roll(img, shift=(3, 6), axis=(0, 1))
    imgs = jnp.stack([jnp.asarray(img), jnp.asarray(shifted)])
    f = extract_features(imgs, max_features=256, pyramid_levels=1)
    m = match_pair_dense(
        imgs[0], imgs[1], f.xy[0], f.valid[0], f.xy[1], f.valid[1], max_matches=256)
    valid = np.asarray(m.valid)
    idx = np.asarray(m.idx)[valid]
    assert len(idx) > 30, f"only {len(idx)} dense-flow matches"
    d = np.asarray(f.xy[1])[idx[:, 1]] - np.asarray(f.xy[0])[idx[:, 0]]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [6.0, 3.0], atol=0.6)


def test_of_match_pair():
    img = random_dot_image(h=160, w=200, n_dots=150, seed=4)
    shifted = np.roll(img, shift=(2, 5), axis=(0, 1))
    imgs = jnp.stack([jnp.asarray(img), jnp.asarray(shifted)])
    f = extract_features(imgs, max_features=256, pyramid_levels=1)
    m = match_pair_optical_flow(
        imgs[0], imgs[1], f.xy[0], f.valid[0], f.xy[1], f.valid[1], max_matches=256)
    valid = np.asarray(m.valid)
    idx = np.asarray(m.idx)[valid]
    assert len(idx) > 40, f"only {len(idx)} flow matches"
    d = np.asarray(f.xy[1])[idx[:, 1]] - np.asarray(f.xy[0])[idx[:, 0]]
    med = np.median(d, axis=0)
    np.testing.assert_allclose(med, [5.0, 2.0], atol=0.5)
    # right-feature dedup invariant (OFFeatureMatcher.cpp:140-151)
    assert len(np.unique(idx[:, 1])) == len(idx)
