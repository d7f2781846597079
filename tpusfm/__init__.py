"""tpusfm — a TPU-native incremental Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
royshil/SfM-Toy-Library: batched feature detection + MXU descriptor
matching, batched-hypothesis RANSAC two-view geometry, Hartley–Sturm
triangulation, PnP view registration, and a Levenberg–Marquardt bundle
adjuster with Schur-complement reduction — scalable over a
``jax.sharding.Mesh`` of TPU devices.
"""

from tpusfm.config import SfMConfig, MatcherKind, EssentialDecomposition
from tpusfm.types import Intrinsics, Features, Matches, PointCloud, Poses

__version__ = "0.1.0"

__all__ = [
    "SfMConfig",
    "MatcherKind",
    "EssentialDecomposition",
    "Intrinsics",
    "Features",
    "Matches",
    "PointCloud",
    "Poses",
]
