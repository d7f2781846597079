"""Distributed-path tests on the virtual 8-device CPU mesh.

Validates that the sharded kernels produce results identical (bitwise or
near) to their single-device counterparts — the determinism requirement
of SURVEY.md §7 ("distributed BA correctness").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import fixtures
from tpusfm import camera
from tpusfm.ba import BAProblem, lm_solve
from tpusfm.dist import adjust_bundle_sharded, make_mesh, match_all_pairs_sharded
from tpusfm.features import extract_features, match_all_pairs


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _ba_inputs(n_pts=64, seed=0):
    intr = fixtures.intrinsics()
    pts = fixtures.dense_points(n_pts, seed=3)
    poses = [
        fixtures.mock_pose((5.0, 5.0, 5.0), (-1.0, 0.0, 1.0)),
        fixtures.mock_pose((-5.0, 0.0, 5.0), (1.0, 0.0, 0.8)),
        fixtures.mock_pose((0.0, -6.0, 2.0), (0.0, 0.5, 1.2)),
        fixtures.mock_pose((2.0, 3.0, -4.0), (-0.5, -0.3, 0.9)),
    ]
    V = len(poses)
    uv = jnp.stack([fixtures.project(p, pts, intr) for p in poses], axis=1)
    rng = np.random.default_rng(seed)
    Rt = jnp.stack(poses)
    noisy_Rt = Rt + 0.01 * jnp.asarray(rng.standard_normal(Rt.shape), jnp.float32)
    noisy_pts = pts + 0.05 * jnp.asarray(rng.standard_normal(pts.shape), jnp.float32)
    return noisy_Rt, noisy_pts, uv, intr, V, n_pts


def test_sharded_ba_matches_single_device(mesh):
    noisy_Rt, noisy_pts, uv, intr, V, n = _ba_inputs()
    cam_valid = jnp.ones((V,), bool)
    pt_valid = jnp.ones((n,), bool)
    mask = jnp.ones((n, V), bool)

    from tpusfm.ba import adjust_bundle

    Rt1, pts1, K1, s1 = adjust_bundle(
        noisy_Rt, cam_valid, noisy_pts, pt_valid, uv, mask, intr.K, max_iterations=25)
    Rt8, pts8, K8, s8 = adjust_bundle_sharded(
        mesh, noisy_Rt, cam_valid, noisy_pts, pt_valid, uv, mask, intr.K, max_iterations=25)

    # both must fully converge to the (same) minimum
    assert float(s1.final_cost) < 1e-2
    assert float(s8.final_cost) < 1e-2
    np.testing.assert_allclose(np.asarray(Rt8), np.asarray(Rt1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(K8[0, 0]), np.asarray(K1[0, 0]), rtol=1e-4)


def test_sharded_matching_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 96, 128)).astype(np.float32)
    # smooth the noise so FAST finds structure
    import scipy.ndimage as ndi

    imgs = np.stack([ndi.gaussian_filter(im, 1.5) for im in imgs]).astype(np.float32)
    feats = extract_features(jnp.asarray(imgs), max_features=256, pyramid_levels=1)
    pairs = jnp.asarray([(i, j) for i in range(4) for j in range(i + 1, 4)]
                        + [(0, 1), (0, 2)], dtype=jnp.int32)  # pad to 8
    m1 = match_all_pairs(feats, pairs, max_matches=128)
    m8 = match_all_pairs_sharded(mesh, feats, pairs, max_matches=128)
    np.testing.assert_array_equal(np.asarray(m1.idx), np.asarray(m8.idx))
    np.testing.assert_array_equal(np.asarray(m1.valid), np.asarray(m8.valid))


def test_sharded_ba_deterministic(mesh):
    noisy_Rt, noisy_pts, uv, intr, V, n = _ba_inputs()
    cam_valid = jnp.ones((V,), bool)
    pt_valid = jnp.ones((n,), bool)
    mask = jnp.ones((n, V), bool)
    out1 = adjust_bundle_sharded(mesh, noisy_Rt, cam_valid, noisy_pts, pt_valid,
                                 uv, mask, intr.K, max_iterations=10)
    out2 = adjust_bundle_sharded(mesh, noisy_Rt, cam_valid, noisy_pts, pt_valid,
                                 uv, mask, intr.K, max_iterations=10)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


def test_sparse_ba_sharded_matches_single(eight_devices):
    """COO distributed BA (dist/sparse_ba.py): 8-shard solve reaches the
    same optimum as the single-device sparse solver on the same problem."""
    import jax.numpy as jnp
    import numpy as np

    from tests import fixtures
    from tpusfm import camera
    from tpusfm.ba.sparse import adjust_bundle_sparse
    from tpusfm.dist import adjust_bundle_sparse_sharded, make_mesh

    rng = np.random.default_rng(0)
    V, N = 4, 64                      # divisible by the 8-device mesh
    intr = fixtures.intrinsics()
    pts = np.stack([rng.uniform(-6, 6, N), rng.uniform(-4, 4, N),
                    rng.uniform(12, 30, N)], 1).astype(np.float32)
    Rt = jnp.stack([
        fixtures.mock_pose((2.0 * v, -1.0 * v, 0.5 * v), (-0.5 * v, 0.05 * v, 1.0))
        for v in range(V)])
    Rtn = np.asarray(Rt)
    cidx = np.tile(np.arange(V, dtype=np.int32), N)
    pidx = np.repeat(np.arange(N, dtype=np.int32), V)
    pc = np.einsum("oij,oj->oi", Rtn[cidx, :, :3], pts[pidx]) + Rtn[cidx, :, 3]
    uv = (pc[:, :2] / np.maximum(pc[:, 2:], 1e-6)) * float(intr.focal) \
        + np.asarray(intr.pp)
    w = np.ones(len(cidx), np.float32)
    noisy_Rt = Rt + 0.003 * jnp.asarray(rng.standard_normal(Rt.shape), jnp.float32)
    noisy_pts = jnp.asarray(pts + 0.02 * rng.standard_normal(pts.shape).astype(np.float32))
    cam_valid = jnp.ones((V,), bool)

    single = adjust_bundle_sparse(
        noisy_Rt, cam_valid, noisy_pts, jnp.asarray(cidx), jnp.asarray(pidx),
        jnp.asarray(uv, jnp.float32), jnp.asarray(w), intr.K, max_iterations=40)
    mesh = make_mesh(8)
    sharded = adjust_bundle_sparse_sharded(
        mesh, noisy_Rt, cam_valid, noisy_pts, cidx, pidx, uv, w, intr.K,
        max_iterations=40)
    assert float(single[3].final_cost) < float(single[3].initial_cost) * 1e-2
    assert float(sharded[3].final_cost) < float(sharded[3].initial_cost) * 1e-2
    # same optimum up to solver noise (both started identically)
    np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(single[0]),
                               atol=2e-2)


def test_ring_matching_equals_replicated(eight_devices):
    """Ring-pass view-sharded matching (dist/matching.py) produces the
    same match matrix as the replicated-descriptor path."""
    import jax.numpy as jnp
    import numpy as np

    from tpusfm.dist import (make_mesh, match_all_pairs_ring,
                             ring_matches_to_matrix)
    from tpusfm.features.match import match_all_pairs
    from tpusfm.types import Features

    rng = np.random.default_rng(0)
    V, F, D = 8, 64, 128
    base = np.sign(rng.standard_normal((V, F, D))).astype(np.float32)
    valid = rng.uniform(size=(V, F)) > 0.1
    feats = Features(
        xy=jnp.zeros((V, F, 2)), desc=jnp.asarray(base),
        score=jnp.zeros((V, F)), angle=jnp.zeros((V, F)),
        valid=jnp.asarray(valid))
    pairs = [(i, j) for i in range(V) for j in range(i + 1, V)]
    ref = match_all_pairs(feats, jnp.asarray(np.array(pairs, np.int32)),
                          ratio=0.95, max_matches=32)
    mesh = make_mesh(8)
    ring, gid = match_all_pairs_ring(mesh, feats, ratio=0.95, max_matches=32)
    idx, dist, ok = ring_matches_to_matrix(ring, gid, V)
    np.testing.assert_array_equal(ok, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.where(ok[..., None], idx, -1),
                                  np.where(np.asarray(ref.valid)[..., None],
                                           np.asarray(ref.idx), -1))
