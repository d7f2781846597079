"""Core data model for the TPU-native incremental SfM framework.

Design principle: the reference's object-soup of ``vector<KeyPoint>`` /
``map<int,int>`` provenance (reference: SfMToyLib/SfMCommon.h:55-99) becomes
fixed-shape, padded, masked struct-of-arrays so every stage is
``jit``/``vmap``/``shard_map``-able on TPU. Variable-length collections
(keypoints, matches, map points) are padded to static capacities with
validity masks; provenance ("which feature in which view observes this
point", reference: SfMCommon.h:82-88 ``Point3DInMap.originatingViews``)
is a dense ``(N_points, N_views)`` int32 table with -1 sentinels.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _pytree(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, f) for f in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree
class Intrinsics:
    """Pinhole intrinsics. Mirrors reference ``Intrinsics`` struct
    (SfMToyLib/SfMCommon.h:55-60: K, Kinv, distortion) but as JAX arrays.

    The modern reference hardcodes f=2500 and principal point at the image
    center with zero distortion (SfM.cpp:70-74); we keep the same defaults
    while also supporting calibration loading (legacy
    MultiCameraDistance.cpp:78-89).
    """

    K: jnp.ndarray        # (3, 3) float32
    Kinv: jnp.ndarray     # (3, 3) float32
    dist: jnp.ndarray     # (5,) float32 distortion (k1 k2 p1 p2 k3); zeros by default

    @staticmethod
    def create(f: float, cx: float, cy: float, dist=None) -> "Intrinsics":
        K = jnp.array([[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]], jnp.float32)
        Kinv = jnp.linalg.inv(K)
        d = jnp.zeros((5,), jnp.float32) if dist is None else jnp.asarray(dist, jnp.float32)
        return Intrinsics(K=K, Kinv=Kinv, dist=d)

    @property
    def focal(self) -> jnp.ndarray:
        return self.K[0, 0]

    @property
    def pp(self) -> jnp.ndarray:
        return self.K[:2, 2]


@_pytree
class Features:
    """Per-view keypoints + descriptors, padded to a static capacity.

    Mirrors reference ``Features`` {keypoints, points, descriptors}
    (SfMCommon.h:76-80). Descriptors are stored as ±1-valued bf16/f32 vectors
    (one per BRIEF bit) so that Hamming distance becomes a matmul on the MXU:
    hamming = (D - a·bᵀ) / 2 for D-bit descriptors.
    """

    xy: jnp.ndarray       # (V, F, 2) float32 pixel coords (full-resolution frame)
    desc: jnp.ndarray     # (V, F, D) ±1 descriptor vectors
    score: jnp.ndarray    # (V, F) detector response
    angle: jnp.ndarray    # (V, F) orientation (radians)
    valid: jnp.ndarray    # (V, F) bool

    @property
    def num_views(self) -> int:
        return self.xy.shape[0]

    @property
    def capacity(self) -> int:
        return self.xy.shape[1]

    def view(self, i: int) -> "Features":
        return Features(
            xy=self.xy[i : i + 1],
            desc=self.desc[i : i + 1],
            score=self.score[i : i + 1],
            angle=self.angle[i : i + 1],
            valid=self.valid[i : i + 1],
        )


@_pytree
class Matches:
    """Matches for one image pair, padded to static capacity M.

    Mirrors the reference ``Matching = std::vector<cv::DMatch>``
    (SfMCommon.h:95) as index pairs + validity mask. ``idx[:, 0]`` indexes
    the left view's features, ``idx[:, 1]`` the right view's.
    """

    idx: jnp.ndarray      # (M, 2) int32, -1 padded
    dist: jnp.ndarray     # (M,) float32 descriptor distance
    valid: jnp.ndarray    # (M,) bool

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


@_pytree
class PointCloud:
    """Reconstructed map: 3D points + dense provenance table.

    Mirrors reference ``PointCloud = std::vector<Point3DInMap>`` where
    ``Point3DInMap`` = 3D point + map<viewIdx, featureIdx> originating views
    (SfMCommon.h:82-99). Here: ``obs[n, v]`` is the feature index of point n
    in view v, or -1 when view v does not observe point n. Padded to static
    capacity N with ``valid``.
    """

    xyz: jnp.ndarray      # (N, 3) float32
    rgb: jnp.ndarray      # (N, 3) float32 in [0,1]
    obs: jnp.ndarray      # (N, V) int32 feature index per view, -1 sentinel
    valid: jnp.ndarray    # (N,) bool

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int, num_views: int) -> "PointCloud":
        return PointCloud(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            rgb=jnp.zeros((capacity, 3), jnp.float32),
            obs=jnp.full((capacity, num_views), -1, jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )


@_pytree
class Poses:
    """Camera poses for all views as a batch of 3x4 [R|t] world→camera maps.

    Mirrors ``Pose = cv::Matx34f`` + the orchestrator's
    ``mCameraPoses``/``mDoneViews`` (SfM.h:99,135-140): ``valid[v]`` marks a
    registered view (reference uses an empty Matx34f + done-set).
    """

    Rt: jnp.ndarray       # (V, 3, 4) float32
    valid: jnp.ndarray    # (V,) bool

    @staticmethod
    def empty(num_views: int) -> "Poses":
        return Poses(
            Rt=jnp.zeros((num_views, 3, 4), jnp.float32),
            valid=jnp.zeros((num_views,), bool),
        )

    def set(self, view: int, Rt: jnp.ndarray) -> "Poses":
        return Poses(
            Rt=self.Rt.at[view].set(Rt),
            valid=self.valid.at[view].set(True),
        )


def np_of(x: Any) -> np.ndarray:
    """Device array → host numpy (single sync point for host bookkeeping).

    Always returns a writable copy: device_get may hand back a read-only
    view backed by device buffer memory.
    """
    return np.array(jax.device_get(x))
