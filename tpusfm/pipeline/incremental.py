"""The incremental SfM state machine.

Re-designs SfMToyLib/SfM.cpp's pipeline for TPU execution:

  runSfM (SfM.cpp:63-95):
    extractFeatures        -> one vmapped detector call over all views
    createFeatureMatchMatrix (SfM.cpp:157-212, std::thread fan-out)
                           -> chunked vmapped MXU matching over all pairs
    findBaselineTriangulation (SfM.cpp:215-321)
                           -> batched H-inlier ranking + two-view RANSAC
    addMoreViewsToReconstruction (SfM.cpp:366-469)
                           -> PnP RANSAC + pairwise triangulation per view
    adjustCurrentBundle    -> LM/Schur BA after every registration
    saveCloudAndCamerasToPLY (SfM.cpp:631-711) -> io/ply.py

Device kernels all have static shapes (features F, matches M, PnP
correspondences, BA point buckets) so each compiles once; the host keeps
the track graph as flat numpy arrays (points x views observation table +
per-view feature->point inverse maps) and never loops over descriptors.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm import camera
from tpusfm.ba import adjust_bundle
from tpusfm.config import SfMConfig
from tpusfm.features import extract_features, match_all_pairs
from tpusfm.geometry import (
    find_camera_from_match,
    find_camera_pose_2d3d,
    find_homography_inliers,
    triangulate_views,
)
from tpusfm.types import Features, Intrinsics, np_of

_PNP_CAP = 4096
_PAIR_CHUNK = 64

# In-process kernel/engine caches. jax.jit caches traces by FUNCTION
# IDENTITY, so two pipelines with identical configs would otherwise
# re-trace and re-compile every kernel (functools.partial creates fresh
# callables). Keyed by the full config fingerprint (+ shapes for the
# engine), these make pipeline construction free after the first instance
# of a configuration — the dominant cost of the CPU test suite.
_KERNEL_CACHE: Dict = {}
_ENGINE_CACHE: Dict = {}


def _cfg_key(cfg) -> tuple:
    return tuple(
        (f.name, getattr(cfg, f.name)) for f in dataclasses.fields(cfg)
    )


def _next_pow2(n: int, floor: int = 1024) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


@dataclasses.dataclass
class Reconstruction:
    """Final reconstruction state (host numpy)."""

    poses: np.ndarray          # (V, 3, 4)
    pose_valid: np.ndarray     # (V,)
    xyz: np.ndarray            # (N, 3)
    rgb: np.ndarray            # (N, 3) uint8
    obs: np.ndarray            # (N, V) int32 feature index, -1 sentinel
    K: np.ndarray              # (3, 3)
    mean_reprojection_error: float
    stats: Dict

    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]

    def save_ply(self, prefix: str):
        from tpusfm.io import save_cameras_ply, save_point_cloud_ply

        save_point_cloud_ply(prefix + "_points.ply", self.xyz, self.rgb)
        scale = float(np.median(np.linalg.norm(self.xyz - np.median(self.xyz, 0), axis=1))) if len(self.xyz) else 1.0
        save_cameras_ply(prefix + "_cameras.ply", self.poses, self.pose_valid, scale=max(scale * 0.2, 1e-3))

    def save_html(self, path: str):
        """Interactive standalone HTML viewer (viz/html_viewer.py — the
        TPU-era stand-in for the legacy PCL/Qt viewers)."""
        from tpusfm.viz import export_html_viewer

        export_html_viewer(path, self.xyz, self.rgb, self.poses, self.pose_valid)

    def select_points(self, keep: np.ndarray) -> "Reconstruction":
        """New Reconstruction restricted to points where keep is True
        (used by the SOR post-filter, legacy/Visualization.cpp:121-153)."""
        keep = np.asarray(keep, bool)
        return Reconstruction(
            poses=self.poses, pose_valid=self.pose_valid,
            xyz=self.xyz[keep], rgb=self.rgb[keep], obs=self.obs[keep],
            K=self.K, mean_reprojection_error=self.mean_reprojection_error,
            stats=self.stats,
        )


class SfMPipeline:
    """Host-side incremental SfM driver over jitted device kernels.

    Mirrors the public surface of the reference ``SfM`` class (SfM.h:46-145):
    construct, feed images, ``run()``, then export PLY via the returned
    Reconstruction.
    """

    def __init__(self, images_gray: np.ndarray, config: Optional[SfMConfig] = None,
                 images_rgb: Optional[np.ndarray] = None,
                 intrinsics: Optional[Intrinsics] = None, seed: int = 0):
        self.cfg = config or SfMConfig()
        self.gray = np.asarray(images_gray, np.float32)
        self.rgb = images_rgb
        self.V, self.H, self.W = self.gray.shape
        cfg = self.cfg
        if intrinsics is not None:
            self.intr = intrinsics
        else:
            # Reference hardcodes f=2500 at full res, pp = image center
            # (SfM.cpp:70-74); scale focal with the downscale factor.
            f = cfg.default_focal / max(cfg.downscale, 1e-6)
            self.intr = Intrinsics.create(f, self.W / 2.0, self.H / 2.0)
        self._init_intr = self.intr
        self._listeners: List = []
        self._build_kernels()
        self.reset(seed)

    def add_listener(self, fn):
        """Register an update observer (SfMUpdateListener equivalent,
        legacy SfMUpdateListener.h:33-41, notified at MultiCameraPnP.cpp:502,575):
        fn(xyz, rgb, poses, pose_valid) is called after the baseline seed
        and after every registered view — e.g. to stream a growing cloud
        into a viewer."""
        self._listeners.append(fn)

    def _notify(self):
        if not self._listeners:
            return
        n = self.n_points
        xyz = self.xyz[:n].copy()
        rgb = self._point_colors()
        for fn in self._listeners:
            fn(xyz, rgb, self.poses.copy(), self.pose_valid.copy())

    def reset(self, seed: int = 0):
        """Clear reconstruction state, keeping compiled kernels (so repeat
        runs — e.g. benchmarking — pay no recompilation)."""
        cfg = self.cfg
        self.intr = self._init_intr
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._timings = {}
        # --- host track-graph state ---
        cap = cfg.point_capacity
        self.xyz = np.zeros((cap, 3), np.float32)
        self.obs = np.full((cap, self.V), -1, np.int32)
        self.n_points = 0
        self.feat2point = np.full((self.V, cfg.max_features), -1, np.int32)
        self.poses = np.zeros((self.V, 3, 4), np.float32)
        self.pose_valid = np.zeros((self.V,), bool)
        self.done_views: set = set()
        self.good_views: set = set()
        self.features: Optional[Features] = None
        self.feat_xy: Optional[np.ndarray] = None
        self.match_idx: Optional[np.ndarray] = None   # (P, M, 2)
        self.match_valid: Optional[np.ndarray] = None  # (P, M)
        self.match_dist: Optional[np.ndarray] = None   # (P, M)
        self.pair_of: Dict[Tuple[int, int], int] = {}
        self._lookup = None                            # match lookup cache
        # a reset pipeline replays the exact same PRNG streams: repeat
        # runs (tests, benchmarking) are bit-deterministic
        self._fused_runs = -1

    # ------------------------------------------------------------------ #
    # jitted kernels (compiled once per static shape)
    # ------------------------------------------------------------------ #
    def _build_kernels(self):
        cfg = self.cfg
        cache_key = _cfg_key(cfg)
        cached = _KERNEL_CACHE.get(cache_key)
        if cached is not None:
            self.__dict__.update(cached)
            return

        from tpusfm.config import MatcherKind
        from tpusfm.ransac import adaptive_num_hypotheses

        # confidence-derived hypothesis floors (reference: prob 0.999 @
        # SfMStereoUtilities.cpp:97, conf 0.99 @ :226); see engine.py
        e_hyp = max(cfg.ransac_hypotheses,
                    adaptive_num_hypotheses(0.75, 8, cfg.essential_prob))
        pnp_hyp = max(cfg.pnp_hypotheses,
                      adaptive_num_hypotheses(0.6, 6, cfg.pnp_confidence))

        # extract_features jits internally per pyramid level (one small
        # program per level compiles far faster than a monolithic graph).
        # The optical-flow strategy uses single-scale detection like the
        # legacy FAST-only path (OFFeatureMatcher.cpp:60-62) — stacked
        # multi-scale duplicates of a corner defeat endpoint association.
        levels = (1 if cfg.matcher in (MatcherKind.OPTICAL_FLOW, MatcherKind.DENSE,
                                       MatcherKind.STEREO)
                  else cfg.pyramid_levels)
        if cfg.matcher == MatcherKind.SURF:
            # float-descriptor blob pipeline (legacy GPU-SURF path, L6)
            from tpusfm.features.blob import extract_blob_features

            self._jit_extract = functools.partial(
                extract_blob_features, max_features=cfg.max_features)
        else:
            self._jit_extract = functools.partial(
                extract_features,
                max_features=cfg.max_features,
                desc_bits=cfg.desc_bits,
                pyramid_levels=levels,
                pyramid_scale=cfg.pyramid_scale,
                fast_threshold=cfg.fast_threshold / 255.0,
                score_kind=cfg.detector_score,
                sampling=cfg.descriptor_sampling,
            )
        self._jit_match = jax.jit(
            functools.partial(
                match_all_pairs,
                ratio=(cfg.match_ratio_flow if cfg.matcher == MatcherKind.SURF
                       else cfg.match_ratio),
                cross_check=cfg.cross_check,
                max_matches=cfg.max_matches,
                metric=("l2" if cfg.matcher == MatcherKind.SURF else "hamming"),
            )
        )
        # fused Pallas matcher: TPU only (CPU fallback is the jnp path);
        # cross-check needs the full distance matrix, so it stays on jnp
        self._use_pallas_matcher = (
            cfg.use_pallas_matcher
            and jax.default_backend() != "cpu"
            and not cfg.cross_check
            and cfg.matcher == MatcherKind.RICH
            and cfg.max_features % 256 == 0
        )
        if self._use_pallas_matcher:
            from tpusfm.features.pallas_match import match_pairs_pallas

            self._jit_match_pallas = jax.jit(
                functools.partial(
                    match_pairs_pallas,
                    ratio=cfg.match_ratio,
                    max_matches=cfg.max_matches,
                )
            )

        def homography_counts(key, uv1, uv2, mask):
            keys = jax.random.split(key, uv1.shape[0])

            def one(k, a, b, m):
                cnt, _, _ = find_homography_inliers(
                    k, a, b, m,
                    threshold_px=cfg.ransac_threshold_px,
                    hypotheses=cfg.ransac_hypotheses // 2,
                )
                return cnt

            return jax.vmap(one)(keys, uv1, uv2, mask)

        self._jit_homography_counts = jax.jit(homography_counts)

        from tpusfm.config import EssentialDecomposition

        self._jit_two_view = jax.jit(
            functools.partial(
                find_camera_from_match,
                threshold_px=cfg.essential_threshold_px,
                hypotheses=e_hyp,
                use_horn=cfg.decomposition == EssentialDecomposition.HORN90,
                # legacy cheirality acceptance gates: >=75 % of inliers in
                # front + reprojection < 100 px (FindCameraMatrices.cpp:277-326,
                # :465-470)
                min_front_frac=cfg.cheirality_min_frac,
                max_front_reproj_px=cfg.cheirality_max_reproj_px,
            )
        )

        def triangulate(Rt1, Rt2, K, Kinv, uv1, uv2, mask):
            return triangulate_views(
                Rt1, Rt2, K, Kinv, uv1, uv2, mask,
                max_reprojection_error=cfg.min_reprojection_error,
                iterations=cfg.triangulation_iters,
                eps=cfg.triangulation_eps,
            )

        self._jit_triangulate = jax.jit(triangulate)

        from tpusfm.geometry.essential import epipolar_inliers

        def prune_chunk(key, uv1, uv2, mask, K, Kinv):
            keys = jax.random.split(key, uv1.shape[0])

            def one(k, a, b, m):
                return epipolar_inliers(
                    k, a, b, m, K, Kinv,
                    threshold_px=cfg.epipolar_prune_threshold_px,
                    hypotheses=cfg.epipolar_prune_hypotheses,
                )

            return jax.vmap(one)(keys, uv1, uv2, mask)

        self._jit_prune = jax.jit(prune_chunk)

        self._jit_pnp = jax.jit(
            functools.partial(
                find_camera_pose_2d3d,
                threshold_px=cfg.pnp_threshold_px,
                hypotheses=pnp_hyp,
                min_inlier_ratio=cfg.pose_inliers_minimal_ratio,
            )
        )

        def prune_triangulate_batch(key, Rt_new, Rt_g, uv1, uv2, mask, K, Kinv):
            """Epipolar-prune + triangulate the new view against ALL good
            views in one vmapped program (replaces the reference's serial
            per-good-view loop, SfM.cpp:413-461)."""
            keys = jax.random.split(key, uv1.shape[0])

            def one(k, Rtg, a, b, m):
                two = find_camera_from_match(
                    k, a, b, m, K, Kinv,
                    threshold_px=cfg.essential_threshold_px,
                    hypotheses=e_hyp,
                )
                pruned = two.inliers & m
                return triangulate_views(
                    Rt_new, Rtg, K, Kinv, a, b, pruned,
                    max_reprojection_error=cfg.min_reprojection_error,
                    iterations=cfg.triangulation_iters,
                    eps=cfg.triangulation_eps,
                )

            return jax.vmap(one)(keys, Rt_g, uv1, uv2, mask)

        self._jit_prune_triangulate = jax.jit(prune_triangulate_batch)

        self._jit_ba = jax.jit(
            functools.partial(
                adjust_bundle,
                max_iterations=cfg.ba_max_iterations,
                function_tolerance=cfg.ba_function_tolerance,
                initial_lambda=cfg.ba_initial_lambda,
                share_focal=cfg.ba_share_focal,
                refine_pp=cfg.ba_refine_pp,
                dtype=cfg.ba_dtype,
            )
        )

        _KERNEL_CACHE[cache_key] = {
            k: v for k, v in self.__dict__.items()
            if k.startswith("_jit") or k == "_use_pallas_matcher"
        }

    def _split_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _log(self, level: int, msg: str):
        if level >= self.cfg.console_debug_level:
            print(f"[tpusfm] {msg}", flush=True)

    # ------------------------------------------------------------------ #
    # pipeline stages
    # ------------------------------------------------------------------ #
    def _undistort_features(self, feats: Features) -> Features:
        """Undistort keypoint coordinates once, right after extraction,
        when the calibration carries distortion (legacy
        MultiCameraDistance.cpp:78-89 loads real coefficients; the
        reference undistorts inside triangulation,
        SfMStereoUtilities.cpp:146-147). Every downstream stage is then
        purely pinhole."""
        if not np.any(np_of(self.intr.dist) != 0):
            return feats
        und = jax.jit(jax.vmap(functools.partial(
            camera.undistort_points, self.intr.K, self.intr.Kinv, self.intr.dist)))
        return Features(xy=und(feats.xy), desc=feats.desc, score=feats.score,
                        angle=feats.angle, valid=feats.valid)

    def extract(self):
        t0 = time.perf_counter()
        self.features = self._undistort_features(self._jit_extract(jnp.asarray(self.gray)))
        self.features.xy.block_until_ready()
        self.feat_xy = np_of(self.features.xy)
        self.feat_valid = np_of(self.features.valid)
        self._timings["features_s"] = time.perf_counter() - t0
        self._log(2, f"features: {int(self.feat_valid.sum())} keypoints over {self.V} views "
                     f"in {self._timings['features_s']:.2f}s")

    def match(self):
        """All-pairs match matrix, chunked to a fixed batch for one compile.

        Replaces the reference's thread fan-out (SfM.cpp:165-211)."""
        from tpusfm.config import MatcherKind

        t0 = time.perf_counter()
        pairs = [(i, j) for i in range(self.V) for j in range(i + 1, self.V)]
        self.pairs = pairs
        self.pair_of = {p: n for n, p in enumerate(pairs)}
        if self.cfg.matcher in (MatcherKind.OPTICAL_FLOW, MatcherKind.DENSE,
                                MatcherKind.STEREO):
            self._match_optical_flow()
            return
        idx_chunks, valid_chunks, dist_chunks = [], [], []
        for s in range(0, len(pairs), _PAIR_CHUNK):
            chunk = pairs[s : s + _PAIR_CHUNK]
            pad = _PAIR_CHUNK - len(chunk)
            arr = np.array(chunk + [(0, 1)] * pad, np.int32)
            if self._use_pallas_matcher:
                m = self._jit_match_pallas(
                    self.features.desc, self.features.valid, jnp.asarray(arr))
            else:
                m = self._jit_match(self.features, jnp.asarray(arr))
            idx_chunks.append(np_of(m.idx)[: len(chunk)])
            valid_chunks.append(np_of(m.valid)[: len(chunk)])
            dist_chunks.append(np_of(m.dist)[: len(chunk)])
        self.match_idx = np.concatenate(idx_chunks, 0)
        self.match_valid = np.concatenate(valid_chunks, 0)
        self.match_dist = np.concatenate(dist_chunks, 0)
        self._timings["matching_s"] = time.perf_counter() - t0
        counts = self.match_valid.sum(1)
        self._log(2, f"matching: {len(pairs)} pairs, median {int(np.median(counts))} matches "
                     f"in {self._timings['matching_s']:.2f}s")
        if self.cfg.epipolar_prune:
            self.prune_matches_epipolar()
        self._dump_match_overlays()

    def _dump_match_overlays(self):
        """Visual-debug channel: write match overlays for the best pairs
        (imshow-panel equivalent, SfM.cpp:277-286, gated by
        mVisualDebugLevel like SfM.h:77-83)."""
        if self.cfg.visual_debug_level > 2:
            return
        import os

        from tpusfm.viz import draw_keypoints, draw_matches

        os.makedirs(self.cfg.debug_dir, exist_ok=True)
        counts = self.match_valid.sum(1)
        order = np.argsort(-counts)[:6]
        for n in order:
            i, j = self.pairs[n]
            uv1, uv2, valid, _ = self._pair_match_uv(i, j)
            draw_matches(os.path.join(self.cfg.debug_dir, f"matches_{i}_{j}.png"),
                         self.gray[i], self.gray[j], uv1, uv2, valid)
        if self.cfg.visual_debug_level <= 1:
            for v in range(self.V):
                draw_keypoints(os.path.join(self.cfg.debug_dir, f"keypoints_{v}.png"),
                               self.gray[v], self.feat_xy[v], self.feat_valid[v])

    def _match_optical_flow(self):
        """Pairwise matching by flow (legacy OFFeatureMatcher /
        dense-FeatureMatching strategies, MatcherKind.OPTICAL_FLOW /
        DENSE). One jitted kernel per pair, executed over all pairs; the
        flow itself is batched over keypoints (or a dense grid)."""
        from tpusfm.config import MatcherKind
        from tpusfm.features.dense import match_pair_dense
        from tpusfm.features.optical_flow import match_pair_optical_flow
        from tpusfm.features.stereo import match_pair_disparity

        t0 = time.perf_counter()
        if not hasattr(self, "_jit_of_match"):
            cfg = self.cfg
            if cfg.matcher == MatcherKind.DENSE:
                self._jit_of_match = jax.jit(functools.partial(
                    match_pair_dense,
                    max_matches=cfg.max_matches,
                ))
            elif cfg.matcher == MatcherKind.STEREO:
                self._jit_of_match = jax.jit(functools.partial(
                    match_pair_disparity,
                    max_disparity=cfg.max_disparity,
                    max_matches=cfg.max_matches,
                ))
            else:
                self._jit_of_match = jax.jit(functools.partial(
                    match_pair_optical_flow,
                    ratio=cfg.match_ratio_flow,
                    max_matches=cfg.max_matches,
                ))
        gray = jnp.asarray(self.gray)
        idx_list, valid_list, dist_list = [], [], []
        dense = self.cfg.matcher == MatcherKind.DENSE
        for (i, j) in self.pairs:
            extra = {}
            if dense:
                # rigid-transform flow seeding from the ratio-test feature
                # matches (legacy FeatureMatching.cpp:229-259)
                extra = dict(feats1_desc=self.features.desc[i],
                             feats2_desc=self.features.desc[j])
            m = self._jit_of_match(
                gray[i], gray[j],
                self.features.xy[i], self.features.valid[i],
                self.features.xy[j], self.features.valid[j], **extra)
            idx_list.append(np_of(m.idx))
            valid_list.append(np_of(m.valid))
            dist_list.append(np_of(m.dist))
        self.match_idx = np.stack(idx_list, 0)
        self.match_valid = np.stack(valid_list, 0)
        self.match_dist = np.stack(dist_list, 0)
        self._timings["matching_s"] = time.perf_counter() - t0
        counts = self.match_valid.sum(1)
        self._log(2, f"LK-flow matching: {len(self.pairs)} pairs, median "
                     f"{int(np.median(counts))} matches in {self._timings['matching_s']:.2f}s")
        if self.cfg.epipolar_prune:
            self.prune_matches_epipolar()

    def prune_matches_epipolar(self):
        """Global epipolar match-pruning (legacy PruneMatchesBasedOnF,
        MultiCameraPnP.cpp:463-485): re-filter every pair's matches by an
        E-matrix RANSAC consensus, batched over pair chunks on device."""
        t0 = time.perf_counter()
        before = int(self.match_valid.sum())
        for s in range(0, len(self.pairs), _PAIR_CHUNK):
            chunk = self.pairs[s : s + _PAIR_CHUNK]
            uv1 = np.zeros((_PAIR_CHUNK, self.cfg.max_matches, 2), np.float32)
            uv2 = np.zeros_like(uv1)
            msk = np.zeros((_PAIR_CHUNK, self.cfg.max_matches), bool)
            for k, (i, j) in enumerate(chunk):
                a, b, v, _ = self._pair_match_uv(i, j)
                uv1[k], uv2[k], msk[k] = a, b, v
            # only prune pairs with enough matches for the 8-pt solver
            enough = msk.sum(1) >= 16
            inl = np_of(self._jit_prune(
                self._split_key(), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(msk), self.intr.K, self.intr.Kinv))
            for k in range(len(chunk)):
                if enough[k]:
                    self.match_valid[s + k] &= inl[k]
        after = int(self.match_valid.sum())
        self._timings["prune_s"] = time.perf_counter() - t0
        self._log(2, f"epipolar prune: {before} -> {after} matches "
                     f"in {self._timings['prune_s']:.2f}s")

    def _pair_match_uv(self, i: int, j: int):
        """Aligned (uv_i, uv_j, mask) for registered pair (i < j ordering)."""
        a, b = (i, j) if i < j else (j, i)
        p = self.pair_of[(a, b)]
        idx = self.match_idx[p]
        valid = self.match_valid[p]
        li = np.maximum(idx[:, 0], 0)
        ri = np.maximum(idx[:, 1], 0)
        uv_a = self.feat_xy[a][li]
        uv_b = self.feat_xy[b][ri]
        if (a, b) == (i, j):
            return uv_a, uv_b, valid, idx
        return uv_b, uv_a, valid, idx[:, ::-1]

    def sort_views_for_baseline(self) -> List[Tuple[float, Tuple[int, int]]]:
        """Rank pairs by ascending homography-inlier ratio
        (SfM::sortViewsForBaseline, SfM.cpp:333-364): low H-inlier ratio =
        large baseline = good stereo pair; pairs with too few matches are
        excluded (MIN_POINT_COUNT_FOR_HOMOGRAPHY=100, SfM.cpp:52)."""
        counts = self.match_valid.sum(1)
        eligible = [n for n, _ in enumerate(self.pairs)
                    if counts[n] >= self.cfg.min_point_count_for_homography]
        if not eligible:
            # fall back to every non-empty pair, best-matched first
            eligible = [n for n in np.argsort(-counts) if counts[n] >= 16]
        if not eligible:
            return []
        uv1 = np.stack([self._pair_match_uv(*self.pairs[n])[0] for n in eligible])
        uv2 = np.stack([self._pair_match_uv(*self.pairs[n])[1] for n in eligible])
        msk = np.stack([self.match_valid[n] for n in eligible])
        h_inl = np_of(self._jit_homography_counts(
            self._split_key(), jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(msk)))
        ratios = h_inl / np.maximum(counts[eligible], 1)
        order = np.argsort(ratios, kind="stable")
        ranked = [(float(ratios[k]), self.pairs[eligible[k]]) for k in order]
        for r, p in ranked[:8]:
            self._log(1, f"  baseline candidate {p}: H-inlier ratio {r:.3f}")
        return ranked

    def find_baseline_triangulation(self) -> bool:
        """Seed the map from the best stereo pair (SfM.cpp:215-321)."""
        t0 = time.perf_counter()
        K, Kinv = self.intr.K, self.intr.Kinv
        for ratio, (i, j) in self.sort_views_for_baseline():
            uv1, uv2, valid, idx = self._pair_match_uv(i, j)
            res = self._jit_two_view(
                self._split_key(), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(valid), K, Kinv)
            pose_ratio = float(res.inlier_ratio)
            if not bool(res.ok) or pose_ratio < self.cfg.pose_inliers_minimal_ratio:
                self._log(2, f"baseline {i},{j}: pose inlier ratio {pose_ratio:.2f} < "
                             f"{self.cfg.pose_inliers_minimal_ratio} — rejected (SfM.cpp:264-275)")
                continue
            Rt1 = np.concatenate([np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)], 1)
            Rt2 = np_of(res.Rt)
            inl = np_of(res.inliers) & valid
            xyz, keep, e1, e2 = self._jit_triangulate(
                jnp.asarray(Rt1), jnp.asarray(Rt2), K, Kinv,
                jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(inl))
            keep = np_of(keep)
            n_new = int(keep.sum())
            if n_new < 16:
                self._log(2, f"baseline {i},{j}: triangulation produced {n_new} points — rejected")
                continue
            self.poses[i] = Rt1
            self.poses[j] = Rt2
            self.pose_valid[[i, j]] = True
            self.done_views |= {i, j}
            self.good_views |= {i, j}
            self._insert_points(np_of(xyz)[keep], i, idx[keep, 0], j, idx[keep, 1])
            self._log(2, f"baseline {i},{j}: {n_new} seed points "
                         f"(pose inliers {pose_ratio:.2f}, H-ratio {ratio:.3f})")
            self.adjust_bundle()
            self._notify()
            self._timings["baseline_s"] = time.perf_counter() - t0
            return True
        self._timings["baseline_s"] = time.perf_counter() - t0
        return False

    # ------------------------------------------------------------------ #
    # track graph bookkeeping (host)
    # ------------------------------------------------------------------ #
    def _match_lookup(self):
        """(pair_row (V,V), right_of, rdist, left_of) host lookup tables.

        right_of[p, lf] = right-view feature matched to left feature lf of
        pair p (-1 if none); rdist the match distance; left_of the inverse.
        Row P and column F are trash slots."""
        if self._lookup is None:
            P, M = self.match_idx.shape[:2]
            F = self.cfg.max_features
            pair_row = np.full((self.V, self.V), P, np.int32)
            for (a, b), p in self.pair_of.items():
                pair_row[a, b] = p
            rows = np.arange(P)[:, None]
            mv = self.match_valid
            lf = np.where(mv, self.match_idx[:, :, 0], F)
            rf = np.where(mv, self.match_idx[:, :, 1], F)
            right_of = np.full((P + 1, F + 1), -1, np.int32)
            right_of[rows, lf] = np.where(mv, self.match_idx[:, :, 1], -1)
            rdist = np.full((P + 1, F + 1), 1e9, np.float32)
            if self.match_dist is not None:
                rdist[rows, lf] = np.where(mv, self.match_dist, 1e9)
            else:
                # Checkpoints saved before match distances were recorded:
                # treat every surviving ratio-test match as confirming
                # (distance 0) rather than never-confirming (1e9), which
                # would silently drop close-but-unconfirmed merges.
                rdist[rows, lf] = np.where(mv, 0.0, 1e9)
            left_of = np.full((P + 1, F + 1), -1, np.int32)
            left_of[rows, rf] = np.where(mv, self.match_idx[:, :, 0], -1)
            self._lookup = (pair_row, right_of, rdist, left_of)
        return self._lookup

    def _insert_points(self, xyz: np.ndarray, vi: int, fi: np.ndarray, vj: int, fj: np.ndarray):
        """Merge newly triangulated points into the map.

        Full SfM::mergeNewPointCloud semantics (SfM.cpp:530-629, constants
        :50-51): exact-feature claims extend tracks; transitive claims via
        the match matrix (legacy strengthening, MultiCameraPnP.cpp:393-441)
        attach to points found one hop away; points within
        merge_point_min_match_distance of an existing point merge when a
        2D feature match of distance < merge_feature_min_match_distance
        confirms them, and are dropped when close but unconfirmed
        (SfM.cpp:596-600); the rest append.

        Runs on the native C++ runtime (csrc/trackgraph.cc,
        tpusfm_insert_points_v2) when built; vectorized numpy fallback."""
        from tpusfm import native

        cfg = self.cfg
        F = cfg.max_features
        n_new_req = len(fi)
        if self.n_points + n_new_req > self.xyz.shape[0]:
            grow = max(self.xyz.shape[0], n_new_req)
            self.xyz = np.concatenate([self.xyz, np.zeros((grow, 3), np.float32)])
            self.obs = np.concatenate([self.obs, np.full((grow, self.V), -1, np.int32)])
        pair_row, right_of, rdist, left_of = self._match_lookup()

        if native.available():
            K = np_of(self.intr.K)
            out = native.insert_points_v2(
                self.xyz, self.obs, self.feat2point, self.n_points, vi, vj,
                xyz, fi, fj, pair_row, right_of, rdist, left_of,
                cfg.merge_point_min_match_distance,
                cfg.merge_feature_min_match_distance,
                cfg.strengthen_max_match_distance,
                cfg.cross_view_strengthen,
                poses=self.poses, feat_xy=self.feat_xy,
                focal=float(K[0, 0]), cx=float(K[0, 2]), cy=float(K[1, 2]),
                reproj_gate=cfg.min_reprojection_error)
            if out is not None:
                self.n_points, appended, merged, dropped = out
                self._log(1, f"  merge: {appended} new points, {merged} merged, "
                             f"{dropped} dropped")
                return

        fi = np.asarray(fi, np.int64)
        fj = np.asarray(fj, np.int64)
        n = self.n_points
        # exact-feature claims
        pi = self.feat2point[vi, np.clip(fi, 0, F - 1)]
        pj = self.feat2point[vj, np.clip(fj, 0, F - 1)]
        target = np.where(pi >= 0, pi, pj).astype(np.int64)

        # transitive claims (legacy strengthening), each confirmed by
        # reprojection of the claimed map point into BOTH originating
        # views within the triangulation gate — a descriptor-only hop
        # chains wrong tracks on repetitive texture (same gate the fused
        # engine applies, SfMStereoUtilities.cpp:184-190 semantics)
        if cfg.cross_view_strengthen:
            # Reprojection confirmation needs per-feature pixel coordinates;
            # when extract() hasn't populated them (feat_xy is None) the hop
            # is accepted on descriptor distance alone — same degradation as
            # the native runtime (native.py passes reproj_gate=0 then).
            if self.feat_xy is not None:
                uv_i = self.feat_xy[vi, np.clip(fi, 0, F - 1)]
                uv_j = self.feat_xy[vj, np.clip(fj, 0, F - 1)]
                g2 = cfg.min_reprojection_error ** 2
                Kh = np_of(self.intr.K)

                def reproj_ok(p3d):
                    X = self.xyz[np.clip(p3d, 0, max(self.n_points - 1, 0))]
                    ok = np.ones(len(p3d), bool)
                    for v, uv in ((vi, uv_i), (vj, uv_j)):
                        Rt = self.poses[v]
                        pc = X @ Rt[:, :3].T + Rt[:, 3]
                        z = np.where(np.abs(pc[:, 2:3]) < 1e-9, 1e-9, pc[:, 2:3])
                        pr = (pc[:, :2] / z) * Kh[0, 0] + Kh[:2, 2]
                        ok &= (pc[:, 2] > 0) & (((pr - uv) ** 2).sum(1) < g2)
                    return ok
            else:
                def reproj_ok(p3d):
                    return np.ones(len(p3d), bool)

            for w in range(self.V):
                if w == vi or w == vj:
                    continue
                for v_new, f_new in ((vi, fi), (vj, fj)):
                    a, b = min(v_new, w), max(v_new, w)
                    p = pair_row[a, b]
                    table = right_of if v_new < w else left_of
                    cand = table[p, np.clip(f_new, 0, F)]
                    # hop match must be strong (same < 20 bound as the
                    # reference merge confirmation, SfM.cpp:51)
                    d = (rdist[p, np.clip(f_new, 0, F)] if v_new < w
                         else rdist[p, np.clip(cand, 0, F)])
                    p3d = self.feat2point[w, np.clip(cand, 0, F - 1)]
                    hit = ((cand >= 0) & (p3d >= 0)
                           & (d < cfg.strengthen_max_match_distance)
                           & reproj_ok(p3d))
                    target = np.where((target < 0) & hit, p3d, target)

        # 3D-distance merge with 2D feature confirmation
        close = np.zeros(len(fi), bool)
        if n > 0:
            d2 = ((xyz[:, None, :] - self.xyz[None, :n, :]) ** 2).sum(-1)
            ne = d2.argmin(1)
            close = d2.min(1) < cfg.merge_point_min_match_distance ** 2
            obs_ne = self.obs[ne]                                     # (Mn, V)
            confirmed = np.zeros(len(fi), bool)
            for v_new, f_new in ((vi, fi), (vj, fj)):
                w = np.arange(self.V)
                a = np.minimum(v_new, w)
                b = np.maximum(v_new, w)
                p = pair_row[a, b]
                new_left = v_new < w
                lf = np.where(new_left[None, :], f_new[:, None], obs_ne)
                rf = np.where(new_left[None, :], obs_ne, f_new[:, None])
                lf_s = np.clip(lf, 0, F)
                hit = ((obs_ne >= 0) & (w[None, :] != v_new)
                       & (right_of[p[None, :], lf_s] == rf)
                       & (rdist[p[None, :], lf_s] < cfg.merge_feature_min_match_distance))
                confirmed |= hit.any(1)
            target = np.where((target < 0) & close & confirmed, ne, target)

        attach = target >= 0
        drop = ~attach & close
        new = ~attach & ~drop

        # attach both observations to the target point
        t_at = target[attach]
        self.obs[t_at, vi] = fi[attach]
        self.obs[t_at, vj] = fj[attach]
        self.feat2point[vi, fi[attach]] = t_at
        self.feat2point[vj, fj[attach]] = t_at

        n_new = int(new.sum())
        if n_new:
            if self.n_points + n_new > self.xyz.shape[0]:
                grow = max(self.xyz.shape[0], n_new)
                self.xyz = np.concatenate([self.xyz, np.zeros((grow, 3), np.float32)])
                self.obs = np.concatenate([self.obs, np.full((grow, self.V), -1, np.int32)])
            rows = np.arange(self.n_points, self.n_points + n_new)
            self.xyz[rows] = xyz[new]
            self.obs[rows, vi] = fi[new]
            self.obs[rows, vj] = fj[new]
            self.feat2point[vi, fi[new]] = rows
            self.feat2point[vj, fj[new]] = rows
            self.n_points += n_new
        self._log(1, f"  merge: {n_new} new points, {int(attach.sum())} merged, "
                     f"{int(drop.sum())} dropped")

    def find_2d3d_matches(self, view: int):
        """2D-3D correspondences for an unregistered view
        (SfM::find2D3DMatches, SfM.cpp:471-528): scan this view's matches
        against every good view; a match whose partner feature is claimed
        by a map point yields (feature uv, point xyz)."""
        from tpusfm import native

        if native.available() and self.match_idx is not None:
            if not hasattr(self, "_pair_row") or self._pair_row.shape[0] != self.V * self.V:
                self._pair_row = np.full((self.V * self.V,), -1, np.int32)
                for (a, b), p in self.pair_of.items():
                    self._pair_row[a * self.V + b] = p
            out = native.find_2d3d(self.feat2point, view, self.good_views,
                                   self._pair_row, self.match_idx, self.match_valid)
            if out is not None:
                return out
        point_of_feat = np.full((self.cfg.max_features,), -1, np.int64)
        for g in sorted(self.good_views):
            if g == view:
                continue
            a, b = (view, g) if view < g else (g, view)
            p = self.pair_of[(a, b)]
            idx = self.match_idx[p]
            valid = self.match_valid[p]
            if view < g:
                f_view, f_g = idx[:, 0], idx[:, 1]
            else:
                f_view, f_g = idx[:, 1], idx[:, 0]
            pts = self.feat2point[g, np.maximum(f_g, 0)]
            sel = valid & (pts >= 0) & (f_view >= 0)
            point_of_feat[f_view[sel]] = pts[sel]
        feats = np.nonzero(point_of_feat >= 0)[0]
        return feats, point_of_feat[feats]

    # ------------------------------------------------------------------ #
    # incremental registration
    # ------------------------------------------------------------------ #
    def add_more_views(self):
        """Register remaining views one by one (SfM.cpp:366-469)."""
        t0 = time.perf_counter()
        K = self.intr.K
        while len(self.done_views) < self.V:
            candidates = {}
            for v in range(self.V):
                if v in self.done_views:
                    continue
                feats, pts = self.find_2d3d_matches(v)
                candidates[v] = (feats, pts)
            if not candidates:
                break
            view = max(candidates, key=lambda v: len(candidates[v][0]))
            feats, pts = candidates[view]
            self.done_views.add(view)
            self._log(2, f"registering view {view} with {len(feats)} 2D-3D matches")
            if len(feats) < 6:
                self._log(3, f"view {view}: too few 2D-3D matches — skipped (SfM.cpp:398-403)")
                continue

            n = min(len(feats), _PNP_CAP)
            X = np.zeros((_PNP_CAP, 3), np.float32)
            uv = np.zeros((_PNP_CAP, 2), np.float32)
            mask = np.zeros((_PNP_CAP,), bool)
            X[:n] = self.xyz[pts[:n]]
            uv[:n] = self.feat_xy[view][feats[:n]]
            mask[:n] = True
            res = self._jit_pnp(self._split_key(), jnp.asarray(X), jnp.asarray(uv),
                                jnp.asarray(mask), K, self.intr.Kinv)
            if not bool(res.ok):
                self._log(3, f"view {view}: PnP inlier ratio {float(res.inlier_ratio):.2f} < "
                             f"{self.cfg.pose_inliers_minimal_ratio} — skipped")
                continue
            # legacy sanity gate: inliers >= points/5 (MultiCameraPnP.cpp:287)
            n_inl = int(np_of(res.inliers).sum())
            if n_inl < self.cfg.min_pnp_inlier_fraction * n:
                self._log(3, f"view {view}: {n_inl} PnP inliers < "
                             f"{self.cfg.min_pnp_inlier_fraction:.2f} x {n} correspondences "
                             f"— rejected (MultiCameraPnP.cpp:287)")
                continue
            Rt_new = np_of(res.Rt)
            # legacy pose sanity gates (MultiCameraPnP.cpp:287-299):
            # runaway translation and incoherent (det != +1) rotations
            if np.linalg.norm(Rt_new[:, 3]) > self.cfg.max_translation_norm:
                self._log(3, f"view {view}: ||t||={np.linalg.norm(Rt_new[:, 3]):.1f} > "
                             f"{self.cfg.max_translation_norm} — rejected (MultiCameraPnP.cpp:292)")
                continue
            if abs(np.linalg.det(Rt_new[:, :3]) - 1.0) > 1e-2:
                self._log(3, f"view {view}: incoherent rotation — rejected "
                             f"(CheckCoherentRotation, FindCameraMatrices.cpp:113-142)")
                continue
            self.poses[view] = Rt_new
            self.pose_valid[view] = True

            # triangulate against every already-good view, batched into one
            # padded vmapped call (SfM.cpp:413-461 without the serial loop)
            M = self.cfg.max_matches
            G = self.V  # padded batch: one slot per possible good view
            uv1b = np.zeros((G, M, 2), np.float32)
            uv2b = np.zeros((G, M, 2), np.float32)
            maskb = np.zeros((G, M), bool)
            Rt_gb = np.tile(np.eye(3, 4, dtype=np.float32), (G, 1, 1))
            idx_b = np.full((G, M, 2), -1, np.int32)
            slot_view = []
            for g in sorted(self.good_views):
                uv1, uv2, valid, idx = self._pair_match_uv(view, g)
                if valid.sum() < 8:
                    continue
                k = len(slot_view)
                uv1b[k], uv2b[k], maskb[k] = uv1, uv2, valid
                Rt_gb[k] = self.poses[g]
                idx_b[k] = idx
                slot_view.append(g)
            if slot_view:
                xyzb, keepb, e1b, e2b = self._jit_prune_triangulate(
                    self._split_key(), jnp.asarray(self.poses[view]),
                    jnp.asarray(Rt_gb), jnp.asarray(uv1b), jnp.asarray(uv2b),
                    jnp.asarray(maskb), K, self.intr.Kinv)
                xyzb, keepb = np_of(xyzb), np_of(keepb)
                e1b, e2b = np_of(e1b), np_of(e2b)
                for k, g in enumerate(slot_view):
                    keep = keepb[k]
                    if self.cfg.adaptive_reprojection_filter and keep.any():
                        keep &= self._adaptive_filter(e1b[k], e2b[k], keep)
                    if keep.sum():
                        self._insert_points(xyzb[k][keep], view,
                                            idx_b[k][keep, 0], g, idx_b[k][keep, 1])
            self.good_views.add(view)
            self.adjust_bundle()
            self._notify()
        self._timings["add_views_s"] = time.perf_counter() - t0

    def _adaptive_filter(self, e1: np.ndarray, e2: np.ndarray, keep: np.ndarray) -> np.ndarray:
        """Legacy adaptive reprojection gate (MultiCameraPnP.cpp:347-358,
        Snavely §4.2): threshold = clamp(2.4 * 80th-percentile, keep_px,
        reject_px)."""
        cfg = self.cfg
        err = np.maximum(e1, e2)
        p = np.percentile(err[keep], cfg.adaptive_percentile)
        thr = min(max(cfg.adaptive_multiplier * p, cfg.adaptive_keep_px),
                  cfg.adaptive_reject_px)
        return err <= thr

    # ------------------------------------------------------------------ #
    # bundle adjustment
    # ------------------------------------------------------------------ #
    def adjust_bundle(self):
        """Global BA over all registered cameras + live points
        (SfM::adjustCurrentBundle, SfM.cpp:324-330). Point count is padded
        to a power-of-two bucket so recompiles are logarithmic."""
        if self.n_points == 0:
            return
        t0 = time.perf_counter()
        cap = _next_pow2(self.n_points)
        obs = np.full((cap, self.V), -1, np.int32)
        obs[: self.n_points] = self.obs[: self.n_points]
        xyz = np.zeros((cap, 3), np.float32)
        xyz[: self.n_points] = self.xyz[: self.n_points]
        pt_valid = np.zeros((cap,), bool)
        pt_valid[: self.n_points] = True
        uv = self.feat_xy[np.arange(self.V)[None, :], np.maximum(obs, 0)]  # (cap,V,2)
        mask = obs >= 0

        out_Rt, out_pts, outK, summary = self._jit_ba(
            jnp.asarray(self.poses), jnp.asarray(self.pose_valid),
            jnp.asarray(xyz), jnp.asarray(pt_valid),
            jnp.asarray(uv), jnp.asarray(mask), self.intr.K)
        improved = float(summary.final_cost) < float(summary.initial_cost)
        if improved:
            self.poses = np_of(out_Rt)
            self.xyz[: self.n_points] = np_of(out_pts)[: self.n_points]
            newK = np_of(outK)
            self.intr = Intrinsics.create(float(newK[0, 0]), float(newK[0, 2]), float(newK[1, 2]))
        dt = time.perf_counter() - t0
        self._timings["ba_s"] = self._timings.get("ba_s", 0.0) + dt
        self._timings["ba_iters"] = self._timings.get("ba_iters", 0) + int(summary.iterations)
        self._log(2, f"BA: cost {float(summary.initial_cost):.1f} -> {float(summary.final_cost):.1f} "
                     f"in {int(summary.iterations)} iters ({dt:.2f}s)"
                     + ("" if improved else " — rejected (SfMBundleAdjustmentUtils.cpp:182-185)"))

    # ------------------------------------------------------------------ #
    # checkpoint / resume (new capability — the reference has none
    # mid-run, SURVEY.md §5; multi-host runs need restartability)
    # ------------------------------------------------------------------ #
    def save_checkpoint(self, path: str):
        """Serialize the full reconstruction state (track graph, poses,
        features, matches, intrinsics) to one .npz."""
        np.savez_compressed(
            path,
            xyz=self.xyz[: self.n_points],
            obs=self.obs[: self.n_points],
            feat2point=self.feat2point,
            poses=self.poses,
            pose_valid=self.pose_valid,
            done_views=np.array(sorted(self.done_views), np.int32),
            good_views=np.array(sorted(self.good_views), np.int32),
            K=np_of(self.intr.K),
            feat_xy=self.feat_xy if self.feat_xy is not None else np.zeros(0),
            feat_valid=self.feat_valid if self.feat_valid is not None else np.zeros(0),
            feat_desc=np_of(self.features.desc) if self.features is not None else np.zeros(0),
            feat_score=np_of(self.features.score) if self.features is not None else np.zeros(0),
            feat_angle=np_of(self.features.angle) if self.features is not None else np.zeros(0),
            match_idx=self.match_idx if self.match_idx is not None else np.zeros(0),
            match_valid=self.match_valid if self.match_valid is not None else np.zeros(0),
            match_dist=self.match_dist if self.match_dist is not None else np.zeros(0),
        )

    def load_checkpoint(self, path: str):
        """Restore state saved by save_checkpoint; the incremental loop
        (add_more_views) can continue from here."""
        d = np.load(path)
        n = d["xyz"].shape[0]
        self.reset()
        self.xyz[:n] = d["xyz"]
        self.obs[:n] = d["obs"]
        self.n_points = n
        self.feat2point = d["feat2point"]
        self.poses = d["poses"]
        self.pose_valid = d["pose_valid"]
        self.done_views = set(int(v) for v in d["done_views"])
        self.good_views = set(int(v) for v in d["good_views"])
        K = d["K"]
        self.intr = Intrinsics.create(float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))
        self.feat_xy = d["feat_xy"] if d["feat_xy"].size else None
        self.feat_valid = d["feat_valid"] if d["feat_valid"].size else None
        if d["feat_desc"].size:
            self.features = Features(
                xy=jnp.asarray(d["feat_xy"]), desc=jnp.asarray(d["feat_desc"]),
                score=jnp.asarray(d["feat_score"]), angle=jnp.asarray(d["feat_angle"]),
                valid=jnp.asarray(d["feat_valid"]))
        if d["match_idx"].size:
            self.match_idx = d["match_idx"]
            self.match_valid = d["match_valid"]
            if "match_dist" in d and d["match_dist"].size:
                self.match_dist = d["match_dist"]
            self.pairs = [(i, j) for i in range(self.V) for j in range(i + 1, self.V)]
            self.pair_of = {p: n_ for n_, p in enumerate(self.pairs)}

    # ------------------------------------------------------------------ #
    # results
    # ------------------------------------------------------------------ #
    def mean_reprojection_error(self) -> float:
        n = self.n_points
        if n == 0:
            return float("nan")
        K = np_of(self.intr.K)
        errs = []
        for v in range(self.V):
            if not self.pose_valid[v]:
                continue
            sel = self.obs[:n, v] >= 0
            if not sel.any():
                continue
            pts = self.xyz[:n][sel]
            uv = self.feat_xy[v][self.obs[:n, v][sel]]
            proj = np_of(camera.project_points(jnp.asarray(self.poses[v]), jnp.asarray(K), jnp.asarray(pts)))
            errs.append(np.linalg.norm(proj - uv, axis=1))
        return float(np.mean(np.concatenate(errs))) if errs else float("nan")

    def _point_colors(self) -> np.ndarray:
        """RGB per point, averaged over originating views (legacy
        GetRGBForPointCloud, MultiCameraDistance.cpp:157-188; the modern
        lib samples only the first view, SfM.cpp:651-655)."""
        n = self.n_points
        out = np.full((n, 3), 255, np.uint8)
        if self.rgb is None:
            return out
        acc = np.zeros((n, 3), np.float64)
        cnt = np.zeros((n,), np.int64)
        for v in range(self.V):
            sel = self.obs[:n, v] >= 0
            if not sel.any():
                continue
            uv = self.feat_xy[v][self.obs[:n, v][sel]]
            x = np.clip(uv[:, 0].round().astype(int), 0, self.W - 1)
            y = np.clip(uv[:, 1].round().astype(int), 0, self.H - 1)
            acc[sel] += self.rgb[v][y, x]
            cnt[sel] += 1
        ok = cnt > 0
        out[ok] = (acc[ok] / cnt[ok, None]).round().astype(np.uint8)
        return out

    # ------------------------------------------------------------------ #
    # fused device-resident path (pipeline/engine.py)
    # ------------------------------------------------------------------ #
    def _fused_applicable(self) -> bool:
        from tpusfm.config import MatcherKind

        return (
            self.cfg.fused
            and self.cfg.matcher == MatcherKind.RICH
            and not self.cfg.ba_refine_pp
            and not self._listeners          # observers need per-view host snapshots
        )

    def _run_fused(self) -> Reconstruction:
        """Device-resident execution: the whole incremental loop runs as
        one jitted program (see pipeline/engine.py); the host performs a
        single H2D image upload and a single batched result fetch."""
        from tpusfm.pipeline.engine import FusedEngine

        if not hasattr(self, "_engine"):
            K = np_of(self.intr.K)
            ek = (_cfg_key(self.cfg), self.V, self.H, self.W,
                  float(K[0, 0]), float(K[0, 2]), float(K[1, 2]))
            if ek not in _ENGINE_CACHE:
                _ENGINE_CACHE[ek] = FusedEngine(
                    self.cfg, self.V, self.H, self.W, f=float(K[0, 0]),
                    cx=float(K[0, 2]), cy=float(K[1, 2]))
            self._engine = _ENGINE_CACHE[ek]
        if self._use_pallas_matcher:
            match_fn = lambda feats, pairs: self._jit_match_pallas(
                feats.desc, feats.valid, pairs)
        else:
            match_fn = self._jit_match
        base_extract = self._jit_extract
        extract_fn = lambda imgs: self._undistort_features(base_extract(imgs))
        if not hasattr(self, "_gray_u8"):
            self._gray_u8 = (np.clip(self.gray, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        gray_u8 = self._gray_u8
        self._fused_runs += 1
        out = self._engine.run(gray_u8, extract_fn, match_fn,
                               seed=self._seed + self._fused_runs)
        if not bool(out["seeded"]):
            raise RuntimeError(
                "no baseline pair could seed the reconstruction "
                "(reference aborts the same way, MultiCameraPnP.cpp:144-147)")

        # mirror results into the host-side state for downstream consumers
        n = int(out["n_points"])
        if n >= self._engine.CAP:
            import warnings
            warnings.warn(
                f"map saturated engine_point_capacity={self._engine.CAP}: "
                "new points were silently routed to the trash row; raise "
                "SfMConfig.engine_point_capacity to keep them", RuntimeWarning)
        self.n_points = n
        cap = max(self.xyz.shape[0], n)
        self.xyz = np.zeros((cap, 3), np.float32)
        self.obs = np.full((cap, self.V), -1, np.int32)
        self.xyz[:n] = out["xyz"][:n]
        self.obs[:n] = out["obs"][:n]
        self.poses = np.array(out["poses"])
        self.pose_valid = np.array(out["pose_valid"])
        self.feat_xy = np.array(out["feat_xy"])
        self.feat_valid = np.array(out["feat_valid"])
        self.done_views = set(range(self.V))
        self.good_views = set(int(v) for v in np.nonzero(self.pose_valid)[0])
        # preserve the calibrated principal point (the engine projects
        # through cx/cy, not the image center) and the distortion
        # coefficients — a repeated run() must keep undistorting features
        self.intr = Intrinsics.create(float(out["focal"]),
                                      self._engine.cx, self._engine.cy,
                                      dist=np_of(self.intr.dist))
        self._timings.update(self._engine.timings)
        stats = np.array(out["stats"])
        self._timings["ba_iters"] = int(stats[:, 9].sum())
        for r, row in enumerate(stats):
            if r == 0:
                i, j = int(row[0]) // 100, int(row[0]) % 100
                self._log(2, f"baseline {i},{j}: {int(row[4])} seed points "
                             f"(pose inliers {row[2]:.2f}), BA {row[7]:.1f} -> {row[8]:.1f} "
                             f"in {int(row[9])} iters")
            elif r == len(stats) - 1:
                if row[3] > 0:
                    self._log(2, f"final BA: {row[7]:.1f} -> {row[8]:.1f} "
                                 f"in {int(row[9])} iters")
            elif row[1] > 0 or row[3] > 0:
                self._log(2, f"view {int(row[0])}: {int(row[1])} 2D-3D matches, "
                             f"PnP ratio {row[2]:.2f}, ok={bool(row[3])}, "
                             f"+{int(row[4])} new / {int(row[5])} merged / "
                             f"{int(row[6])} dropped, BA {row[7]:.1f} -> {row[8]:.1f} "
                             f"in {int(row[9])} iters")
        err = float(out["mean_err"])
        self._log(2, f"done (fused): {n} points, {int(self.pose_valid.sum())}/{self.V} "
                     f"cameras, mean reprojection error {err:.3f}px, "
                     f"{self._timings['total_s']:.2f}s")
        return Reconstruction(
            poses=self.poses.copy(), pose_valid=self.pose_valid.copy(),
            xyz=self.xyz[:n].copy(), rgb=self._point_colors(),
            obs=self.obs[:n].copy(), K=np_of(self.intr.K),
            mean_reprojection_error=err, stats=dict(self._timings),
        )

    def run(self) -> Reconstruction:
        """Full pipeline (SfM::runSfM, SfM.cpp:63-95)."""
        if self._fused_applicable():
            return self._run_fused()
        t0 = time.perf_counter()
        self.extract()
        self.match()
        if not self.find_baseline_triangulation():
            raise RuntimeError(
                "no baseline pair could seed the reconstruction "
                "(reference aborts the same way, MultiCameraPnP.cpp:144-147)")
        self.add_more_views()
        self._timings["total_s"] = time.perf_counter() - t0
        err = self.mean_reprojection_error()
        self._log(2, f"done: {self.n_points} points, {int(self.pose_valid.sum())}/{self.V} cameras, "
                     f"mean reprojection error {err:.3f}px, {self._timings['total_s']:.2f}s")
        return Reconstruction(
            poses=self.poses.copy(),
            pose_valid=self.pose_valid.copy(),
            xyz=self.xyz[: self.n_points].copy(),
            rgb=self._point_colors(),
            obs=self.obs[: self.n_points].copy(),
            K=np_of(self.intr.K),
            mean_reprojection_error=err,
            stats=dict(self._timings),
        )


def run_sfm(directory: str, config: Optional[SfMConfig] = None,
            output_prefix: Optional[str] = None) -> Reconstruction:
    """End-to-end convenience entry (main.cpp:71-78 equivalent)."""
    from tpusfm.io import load_image_directory

    cfg = config or SfMConfig()
    imgs = load_image_directory(directory, cfg.downscale)
    pipe = SfMPipeline(imgs.gray, cfg, images_rgb=imgs.rgb)
    rec = pipe.run()
    if output_prefix:
        rec.save_ply(output_prefix)
    return rec
