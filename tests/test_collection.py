"""Collection-scale pipeline tests (pipeline/collection.py — the
long-dimension architecture for the 500/5000-image BASELINE configs).

Three layers, mirroring the reference's fixture strategy
(SfMUnitTests.cpp:80-146) at collection scale:
  1. pure machinery on INJECTED ground-truth observations — validates the
     track graph, registration loop, and BA interleave are unbiased
     (ATE at the noise floor, no detector in the loop),
  2. end-to-end from rendered images on the virtual 8-device mesh, with
     sharded matching + sharded global COO BA,
  3. windowed pair-graph construction.
"""
import numpy as np
import pytest

from benchmarks.collection_fixture import make_collection
from tests.synthetic_scene import camera_centers, umeyama_alignment
from tpusfm import SfMConfig
from tpusfm.pipeline import CollectionPipeline, window_pairs
from tpusfm.types import Intrinsics


def _ate(rec, poses_gt):
    pv = rec.pose_valid
    gt_c = camera_centers(poses_gt)[pv]
    est_c = camera_centers(rec.poses[pv])
    s, R, t = umeyama_alignment(est_c, gt_c)
    d = gt_c - (s * est_c @ R.T + t)
    return float(np.sqrt((d ** 2).sum(1).mean()))


def test_window_pairs():
    p = window_pairs(6, 2)
    assert (p[:, 0] < p[:, 1]).all()
    assert {(0, 1), (0, 2), (1, 2), (4, 5), (3, 5)} <= set(map(tuple, p))
    assert (5, 0) not in set(map(tuple, p)) and len(p) == 9
    pw = window_pairs(6, 2, wraparound=True)
    assert {(0, 5), (0, 4), (1, 5)} <= set(map(tuple, pw))
    assert len(pw) == 12


def test_collection_tracks_and_registration_synthetic_obs():
    """Inject exact projections (+0.3 px noise) as features/matches: the
    track graph + registration + BA stack must recover the orbit to the
    noise floor — isolates the pipeline math from detector noise."""
    V, ND, F, M = 16, 400, 512, 512
    imgs, poses_gt, K, dots = make_collection(n_views=V, n_dots=ND,
                                              arc_degrees=60.0)
    intr = Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))
    cfg = SfMConfig(max_features=F, max_matches=M, console_debug_level=5,
                    collection_window=4, ba_share_focal=False,
                    ba_incremental_iterations=10,
                    min_point_count_for_homography=60)
    pipe = CollectionPipeline(imgs, cfg, intrinsics=intr)
    rng = np.random.default_rng(0)
    h, w = imgs.shape[1:]
    feat_xy = np.zeros((V, F, 2), np.float32)
    feat_valid = np.zeros((V, F), bool)
    vis = np.zeros((V, ND), bool)
    for v in range(V):
        pc = dots @ poses_gt[v][:, :3].T + poses_gt[v][:, 3]
        uv = pc[:, :2] / pc[:, 2:] * K[0, 0] + K[:2, 2]
        ok = ((pc[:, 2] > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < w)
              & (uv[:, 1] >= 0) & (uv[:, 1] < h))
        vis[v] = ok
        feat_xy[v, :ND] = uv + rng.normal(0, 0.3, (ND, 2))
        feat_valid[v, :ND] = ok
    pipe.feat_xy, pipe.feat_valid = feat_xy, feat_valid
    pipe.features = object()          # sentinel: skip extract()
    P = len(pipe.pairs)
    pipe.match_idx = np.full((P, M, 2), -1, np.int32)
    pipe.match_valid = np.zeros((P, M), bool)
    for p, (i, j) in enumerate(pipe.pairs):
        both = np.nonzero(vis[i] & vis[j])[0][:M]
        pipe.match_idx[p, : len(both), 0] = both
        pipe.match_idx[p, : len(both), 1] = both
        pipe.match_valid[p, : len(both)] = True

    rec = pipe.run()
    assert int(rec.pose_valid.sum()) == V
    assert rec.mean_reprojection_error < 0.6      # ~ injected noise
    assert _ate(rec, poses_gt) < 0.1              # scene scale is 16
    # the track graph must have fused windowed matches into long tracks
    assert rec.num_points < vis.any(0).sum() * 1.2
    lengths = np.bincount(rec.obs_point)
    assert lengths.max() >= 6


@pytest.fixture(scope="module")
def cpu_mesh():
    from tpusfm.dist import make_mesh

    return make_mesh(8)


def test_collection_end_to_end_sharded(cpu_mesh):
    """Full path from rendered images on the 8-device mesh: sharded
    windowed matching + sharded global COO BA, real detector in the
    loop. Dot imagery bounds detector accuracy (~1 px), so the gates
    here are looser than the injected-observation test."""
    V = 12
    imgs, poses_gt, K, dots = make_collection(n_views=V, n_dots=350,
                                              arc_degrees=45.0, seed=3)
    intr = Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))
    cfg = SfMConfig(max_features=768, max_matches=384, console_debug_level=5,
                    collection_window=4, ba_share_focal=False,
                    ba_incremental_iterations=10, ba_max_iterations=50,
                    min_point_count_for_homography=60)
    pipe = CollectionPipeline(imgs, cfg, intrinsics=intr, mesh=cpu_mesh)
    rec = pipe.run()
    assert int(rec.pose_valid.sum()) >= V - 2
    assert rec.mean_reprojection_error < 1.5
    assert rec.num_points > 150
    assert rec.stats["ba_iters"] > 0


def test_multiview_triangulation_kernel():
    """The N-view DLT+GN triangulation must recover points exactly from
    clean multi-view observations, honor the mask, and reject
    low-parallax and high-residual candidates."""
    import jax.numpy as jnp

    from tpusfm import SfMConfig
    from tpusfm.types import Intrinsics

    rng = np.random.default_rng(0)
    f, cx, cy = 300.0, 64.0, 48.0
    Km = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    cfg = SfMConfig(min_triangulation_angle_deg=1.5, console_debug_level=5)
    pipe = CollectionPipeline(np.zeros((2, 8, 8), np.float32), cfg,
                              intrinsics=Intrinsics.create(f, cx, cy))
    KT = pipe._tri_k

    pts = np.stack([rng.uniform(-2, 2, 64), rng.uniform(-2, 2, 64),
                    rng.uniform(8, 14, 64)], 1).astype(np.float32)
    poses = []
    for k in range(KT):
        th = 0.06 * k
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([-0.8 * k, 0.0, 0.05 * k], np.float32)
        poses.append(np.concatenate([R, t[:, None]], 1))
    poses = np.stack(poses)                              # (K, 3, 4)

    B = 64
    Rt = np.broadcast_to(poses, (B, KT, 3, 4)).copy()
    uv = np.zeros((B, KT, 2), np.float32)
    for k in range(KT):
        pc = pts @ poses[k][:, :3].T + poses[k][:, 3]
        uv[:, k] = pc[:, :2] / pc[:, 2:] * f + [cx, cy]
    msk = np.ones((B, KT), np.float32)
    msk[:, KT // 2:] *= (rng.uniform(size=(B, KT - KT // 2)) < 0.7)
    msk[0, 2:] = 0.0                                     # 2-view row

    X, keep = pipe._jit_tri_multi(jnp.asarray(Rt), jnp.asarray(uv),
                                  jnp.asarray(msk), jnp.asarray(Km),
                                  jnp.asarray(np.linalg.inv(Km)))
    X, keep = np.asarray(X), np.asarray(keep)
    assert keep.mean() > 0.9
    assert np.abs(X[keep] - pts[keep]).max() < 1e-2

    # corrupt one observation far beyond the gate -> rejected
    uv_bad = uv.copy()
    uv_bad[:, 1] += 35.0
    _, keep_bad = pipe._jit_tri_multi(jnp.asarray(Rt), jnp.asarray(uv_bad),
                                      jnp.asarray(msk), jnp.asarray(Km),
                                      jnp.asarray(np.linalg.inv(Km)))
    assert not np.asarray(keep_bad).any()

    # zero-baseline cameras -> parallax gate rejects
    Rt0 = np.broadcast_to(poses[0], (B, KT, 3, 4)).copy()
    uv0 = np.broadcast_to(uv[:, 0:1], (B, KT, 2)).copy()
    _, keep0 = pipe._jit_tri_multi(jnp.asarray(Rt0), jnp.asarray(uv0),
                                   jnp.asarray(np.ones((B, KT), np.float32)),
                                   jnp.asarray(Km),
                                   jnp.asarray(np.linalg.inv(Km)))
    assert not np.asarray(keep0).any()
