"""Listener, checkpoint/resume, two-view pipeline, and OF-matcher-in-pipeline
tests (capabilities beyond the happy path: L3, L5, L12 + aux checkpointing)."""
import numpy as np
import pytest

from tests.synthetic_scene import make_scene
from tpusfm import SfMConfig
from tpusfm.config import MatcherKind
from tpusfm.pipeline import SfMPipeline, reconstruct_two_view
from tpusfm.types import Intrinsics


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_views=5, n_dots=400)


def _cfg(**kw):
    base = dict(max_features=1024, max_matches=512, console_debug_level=5,
                min_point_count_for_homography=60)
    base.update(kw)
    return SfMConfig(**base)


def _intr(K):
    return Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))


def test_update_listener_streams_growing_cloud(scene):
    imgs, poses, K, dots = scene
    pipe = SfMPipeline(imgs, _cfg(), intrinsics=_intr(K))
    snapshots = []
    pipe.add_listener(lambda xyz, rgb, p, pv: snapshots.append((len(xyz), int(pv.sum()))))
    pipe.run()
    assert len(snapshots) >= 2, "listener must fire for baseline + each view"
    sizes = [s[0] for s in snapshots]
    assert sizes[-1] >= sizes[0]
    assert snapshots[0][1] == 2  # baseline registers exactly two cameras


def test_checkpoint_resume(tmp_path, scene):
    imgs, poses, K, dots = scene
    pipe = SfMPipeline(imgs, _cfg(), intrinsics=_intr(K))
    pipe.extract()
    pipe.match()
    assert pipe.find_baseline_triangulation()
    ckpt = str(tmp_path / "state.npz")
    pipe.save_checkpoint(ckpt)

    pipe2 = SfMPipeline(imgs, _cfg(), intrinsics=_intr(K))
    pipe2.load_checkpoint(ckpt)
    assert pipe2.n_points == pipe.n_points
    assert pipe2.done_views == pipe.done_views
    np.testing.assert_allclose(pipe2.poses, pipe.poses)
    # resume the incremental loop from the checkpoint
    pipe2.add_more_views()
    assert int(pipe2.pose_valid.sum()) >= 3
    assert pipe2.mean_reprojection_error() < 1.5


def test_two_view_pipeline(scene):
    imgs, poses, K, dots = scene
    rec = reconstruct_two_view(imgs[0], imgs[1], _cfg(), _intr(K))
    assert int(rec.pose_valid.sum()) == 2
    assert rec.num_points > 30
    assert rec.mean_reprojection_error < 1.5


def test_engine_capacity_saturation(scene):
    """Overflowing engine_point_capacity must warn and truncate gracefully
    (fixed-shape design constraint: the fused engine routes overflow points
    to the trash row instead of growing the map, pipeline/engine.py)."""
    imgs, poses, K, dots = scene
    cfg = _cfg(engine_point_capacity=64, use_pallas_matcher=False)
    pipe = SfMPipeline(imgs, cfg, intrinsics=_intr(K))
    assert pipe._fused_applicable()
    with pytest.warns(RuntimeWarning, match="saturated engine_point_capacity"):
        rec = pipe.run()
    assert pipe.n_points <= 64
    assert rec.xyz.shape[0] == pipe.n_points
    assert int(rec.pose_valid.sum()) >= 2  # still a usable reconstruction


def test_optical_flow_matcher_pipeline(scene):
    imgs, poses, K, dots = scene
    cfg = _cfg(matcher=MatcherKind.OPTICAL_FLOW)
    pipe = SfMPipeline(imgs, cfg, intrinsics=_intr(K))
    rec = pipe.run()
    assert int(rec.pose_valid.sum()) >= 3
    assert rec.mean_reprojection_error < 1.5
