"""Visualization & visual debugging.

TPU-era equivalents of the reference's viz surface:
- visual-debug imshow panels (SfM.cpp:277-286,602-624; gated by
  mVisualDebugLevel) -> overlay images written to disk (keypoints,
  match lines, reprojections),
- keypoint/epipolar debug tool (legacy/DrawKeypoints.cpp:14-85),
- 3D viewers (legacy PCL Visualization.cpp / Qt sfmviewer.cpp /
  FLTK DistanceUI.cpp) -> a dependency-free standalone HTML point-cloud
  viewer with orbit controls (works anywhere a browser exists — the
  right analog for a headless TPU pod).
"""

from tpusfm.viz.cloud_filter import sor_filter, sor_filter_mask, voxel_grid_filter
from tpusfm.viz.debug import draw_keypoints, draw_matches, draw_reprojections
from tpusfm.viz.html_viewer import export_html_viewer
from tpusfm.viz.live_viewer import LiveViewer

__all__ = [
    "draw_keypoints",
    "draw_matches",
    "draw_reprojections",
    "export_html_viewer",
    "LiveViewer",
    "sor_filter",
    "sor_filter_mask",
    "voxel_grid_filter",
]
