"""Interactive terminal UI (the legacy FLTK DistanceUI stand-in, L15)."""
import io

import numpy as np

from tests.synthetic_scene import make_scene


class _FakeImages:
    def __init__(self, gray):
        self.gray = gray
        self.rgb = None
        self.num_views = gray.shape[0]


def test_interactive_session_commands(monkeypatch, tmp_path):
    """The command loop mirrors DistanceUI's flow: choose directory,
    toggle a strategy checkbox, press match / recover-depth / visualize
    (legacy/DistanceUI.cpp:109-162)."""
    import tpusfm.ui as ui

    # same scene + config shapes as tests/test_pipeline_extras.py so the
    # in-process kernel/engine caches are shared across the suite
    imgs, poses, K, dots = make_scene(n_views=5, n_dots=400)

    def fake_load(directory, downscale):
        return _FakeImages(np.asarray(imgs))

    import tpusfm.io as tio
    monkeypatch.setattr(tio, "load_image_directory", fake_load)

    from tpusfm import SfMConfig

    base = SfMConfig(max_features=1024, max_matches=512, console_debug_level=5,
                     min_point_count_for_homography=60)
    out = io.StringIO()
    script = io.StringIO(
        "dir /fake/path\n"
        "strategy bogus\n"
        "strategy rich\n"
        "status\n"
        "match\n"
        "run\n"
        f"viz {tmp_path/'v.html'}\n"
        f"save {tmp_path/'rec'}\n"
        "quit\n"
    )
    sess = ui.interactive_loop(stream=script, out=out, base_config=base)
    text = out.getvalue()
    assert "unknown strategy" in text
    assert "strategy = rich" in text
    assert "match matrix built:" in text
    assert "reconstructed" in text
    assert (tmp_path / "v.html").exists()
    assert (tmp_path / "rec_points.ply").exists()
    assert sess.rec is not None and sess.rec.num_points > 0


def test_interactive_requires_directory():
    import tpusfm.ui as ui

    out = io.StringIO()
    sess = ui.InteractiveSession(out=out)
    assert sess.handle("run")
    assert "no directory chosen" in out.getvalue()
