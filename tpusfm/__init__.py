"""tpusfm — a TPU-native incremental Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
royshil/SfM-Toy-Library: batched feature detection + MXU descriptor
matching, batched-hypothesis RANSAC two-view geometry, Hartley–Sturm
triangulation, PnP view registration, and a Levenberg–Marquardt bundle
adjuster with Schur-complement reduction — scalable over a
``jax.sharding.Mesh`` of TPU devices.
"""

import jax as _jax

# TPU matmul default precision is bf16-pass based; the geometry/BA solvers
# build Gram matrices (A^T A) whose conditioning collapses below f32. Run
# all f32 contractions at full precision — ops that WANT bf16 (descriptor
# Hamming matmuls, features/match.py) request it explicitly and are
# unaffected by this default.
_jax.config.update("jax_default_matmul_precision", "highest")

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
