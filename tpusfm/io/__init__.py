"""Host-side IO: dataset loading, PLY/PCD export, calibration files.

Equivalents of the reference's IO surface: directory scan + imread +
downscale (SfMToyLib/SfM.cpp:98-138), PLY export of cloud + camera frusta
(SfM.cpp:631-711), PCD export (legacy/Visualization.cpp:360-365), and
calibration YAML loading with mock-K fallback
(legacy/SfMToyLib_Old/MultiCameraDistance.cpp:78-89).
"""

from tpusfm.io.images import load_image_directory, ImageSet
from tpusfm.io.ply import save_point_cloud_ply, save_cameras_ply, save_pcd
from tpusfm.io.calibration import load_calibration, mock_calibration

__all__ = [
    "load_image_directory",
    "ImageSet",
    "save_point_cloud_ply",
    "save_cameras_ply",
    "save_pcd",
    "load_calibration",
    "mock_calibration",
]
