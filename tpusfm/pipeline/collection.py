"""Collection-scale incremental SfM — the long-dimension architecture.

The classic host loop (pipeline/incremental.py) and the fused engine
(pipeline/engine.py) mirror the reference's all-pairs match matrix
(SfM.cpp:157-212) and per-insert cloud-merge scans (SfM.cpp:530-629);
their lookup tables are O(V^2 F) and cannot reach the 500/5000-image
BASELINE configs. This module re-architects the same incremental
semantics for the long view axis (SURVEY.md §5):

  * windowed pair graph — view i is matched against i+1..i+window
    (+ optional wraparound across a closed loop), O(V*window) pairs
    instead of O(V^2); matching is sharded over the device mesh
    (dist/matching.py) in fixed-size chunks.
  * one global TRACK GRAPH built up front: connected components over the
    match edges via vectorized pointer-jumping label propagation. This
    replaces the reference's exact-feature/transitive/3D-distance merge
    per insertion (SfM.cpp:530-629, MultiCameraPnP.cpp:393-441) — a
    track IS the transitive closure those scans approximate one hop at
    a time.
  * incremental registration keeps the reference's add-view semantics
    (SfM.cpp:366-469): next view = most 2D-3D correspondences, RANSAC
    PnP with the pose-inlier >= 0.5 gate (SfMStereoUtilities.cpp:231)
    and the legacy ||t|| / inlier-fraction sanity gates
    (MultiCameraPnP.cpp:287-299), then per-track two-view triangulation
    with the dual reprojection gate (SfMStereoUtilities.cpp:184-190).
  * BA is the matrix-free COO Schur solver (ba/sparse.py): a sliding
    local window every registration, a global solve every
    collection_global_ba_interval views and at the end — sharded over
    the mesh (dist/sparse_ba.py) when one is given. The reference runs
    a full dense-Schur Ceres solve after every view (SfM.cpp:464-466),
    which is O(V) global solves; local-window BA is the standard
    scalable equivalent.

Everything device-side has static shapes (pow2 buckets for the variable
batches), so the registration loop compiles a bounded set of programs.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm import camera
from tpusfm.ba.sparse import adjust_bundle_sparse
from tpusfm.config import SfMConfig
from tpusfm.features import extract_features
from tpusfm.features.match import match_all_pairs
from tpusfm.geometry import (
    find_camera_from_match,
    find_camera_pose_2d3d,
    find_homography_inliers,
)
from tpusfm.geometry.essential import epipolar_inliers
from tpusfm.geometry.triangulation import triangulate_hartley_sturm
from tpusfm.types import Features, Intrinsics, np_of



def window_pairs(V: int, window: int, wraparound: bool = False) -> np.ndarray:
    """Sequential pair list (P, 2) with i < j: (i, i+1..i+window), plus the
    seam pairs of a closed loop when wraparound (emitted as (j % V, i) so
    the i < j canonical ordering holds)."""
    pairs = set()
    for i in range(V):
        for d in range(1, window + 1):
            j = i + d
            if j < V:
                pairs.add((i, j))
            elif wraparound:
                pairs.add((j % V, i))
    return np.array(sorted(pairs), np.int32)


def _pow2(n: int, floor: int) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


@dataclasses.dataclass
class CollectionReconstruction:
    """Collection-scale result: the track graph stays COO (a dense (N, V)
    observation table at V=5000 would be the exact scaling bug this
    pipeline exists to avoid)."""

    poses: np.ndarray          # (V, 3, 4)
    pose_valid: np.ndarray     # (V,)
    xyz: np.ndarray            # (N, 3)
    rgb: np.ndarray            # (N, 3) uint8
    obs_point: np.ndarray      # (O,) int32 point index
    obs_view: np.ndarray       # (O,) int32 view index
    obs_feat: np.ndarray       # (O,) int32 feature index
    K: np.ndarray              # (3, 3)
    mean_reprojection_error: float
    stats: Dict

    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]

    def save_ply(self, prefix: str):
        from tpusfm.io import save_cameras_ply, save_point_cloud_ply

        save_point_cloud_ply(prefix + "_points.ply", self.xyz, self.rgb)
        scale = float(np.median(np.linalg.norm(
            self.xyz - np.median(self.xyz, 0), axis=1))) if len(self.xyz) else 1.0
        save_cameras_ply(prefix + "_cameras.ply", self.poses, self.pose_valid,
                         scale=max(scale * 0.2, 1e-3))


class CollectionPipeline:
    """Track-graph incremental SfM over a windowed pair graph.

    Same public shape as SfMPipeline (construct -> run() -> result), but
    every data structure is O(V*window + O) instead of O(V^2):
    observations are one COO list over (track, view, feature).
    """

    def __init__(self, images_gray: np.ndarray,
                 config: Optional[SfMConfig] = None,
                 intrinsics: Optional[Intrinsics] = None,
                 mesh=None, pairs: Optional[np.ndarray] = None, seed: int = 0):
        self.cfg = config or SfMConfig()
        self.gray = np.asarray(images_gray, np.float32)
        self.V, self.H, self.W = self.gray.shape
        cfg = self.cfg
        if intrinsics is not None:
            self.intr = intrinsics
        else:
            f = cfg.default_focal / max(cfg.downscale, 1e-6)
            self.intr = Intrinsics.create(f, self.W / 2.0, self.H / 2.0)
        self.mesh = mesh
        self.pairs = (np.asarray(pairs, np.int32) if pairs is not None else
                      window_pairs(self.V, cfg.collection_window,
                                   cfg.collection_wraparound))
        self._key = jax.random.PRNGKey(seed)
        self._timings: Dict = {}
        self._build_kernels()
        # --- state ---
        self.feat_xy: Optional[np.ndarray] = None     # (V, F, 2)
        self.feat_valid: Optional[np.ndarray] = None  # (V, F)
        self.features: Optional[Features] = None
        self.match_idx: Optional[np.ndarray] = None   # (P, M, 2)
        self.match_valid: Optional[np.ndarray] = None
        self.poses = np.zeros((self.V, 3, 4), np.float32)
        self.pose_valid = np.zeros(self.V, bool)
        self.reg_order: List[int] = []
        # track graph (filled by build_tracks)
        self.T = 0
        self.track_xyz: Optional[np.ndarray] = None   # (T, 3)
        self.track_ok: Optional[np.ndarray] = None    # (T,)
        self.obs_track = self.obs_view = self.obs_feat = None
        self.obs_uv = self.obs_alive = None
        self.node2track: Optional[np.ndarray] = None  # (V, F)
        self._ba_iters = 0

    # ------------------------------------------------------------------ #
    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _log(self, level: int, msg: str):
        if level >= self.cfg.console_debug_level:
            print(f"[tpusfm.collection] {msg}", flush=True)

    def _K(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        K = np_of(self.intr.K)
        return jnp.asarray(K), jnp.asarray(np.linalg.inv(K))

    def _build_kernels(self):
        """All kernels take K/Kinv as TRACED arguments, so BA's focal
        refinements never trigger recompilation."""
        cfg = self.cfg

        def h_rank(keys, uv1, uv2, mask):
            def one(k, a, b, m):
                cnt, _, _ = find_homography_inliers(
                    k, a, b, m, threshold_px=cfg.ransac_threshold_px,
                    hypotheses=cfg.ransac_hypotheses // 2)
                return cnt

            return jax.vmap(one)(keys, uv1, uv2, mask)

        self._jit_h_rank = jax.jit(h_rank)

        def epi_prune(keys, uv1, uv2, mask, K, Kinv):
            def one(k, a, b, m):
                inl = epipolar_inliers(
                    k, a, b, m, K, Kinv,
                    threshold_px=cfg.epipolar_prune_threshold_px,
                    hypotheses=cfg.epipolar_prune_hypotheses)
                # only prune pairs with enough matches for the 8-pt solver
                return jnp.where(jnp.sum(m) >= 16, inl & m, m)

            return jax.vmap(one)(keys, uv1, uv2, mask)

        self._jit_epi_prune = jax.jit(epi_prune)

        def two_view(key, uv1, uv2, mask, K, Kinv):
            return find_camera_from_match(
                key, uv1, uv2, mask, K, Kinv,
                threshold_px=cfg.essential_threshold_px,
                hypotheses=cfg.ransac_hypotheses,
                use_horn=cfg.decomposition.value == "horn",
                min_front_frac=cfg.cheirality_min_frac,
                max_front_reproj_px=cfg.cheirality_max_reproj_px)

        self._jit_two_view = jax.jit(two_view)

        def pnp(key, X, uv, mask, K, Kinv):
            return find_camera_pose_2d3d(
                key, X, uv, mask, K, Kinv,
                threshold_px=cfg.pnp_threshold_px,
                hypotheses=cfg.pnp_hypotheses,
                min_inlier_ratio=cfg.pose_inliers_minimal_ratio)

        self._jit_pnp = jax.jit(pnp)

        gate = cfg.min_reprojection_error
        cos_min = float(np.cos(np.radians(cfg.min_triangulation_angle_deg)))

        def tri_rows(Rt1, Rt2, uv1, uv2, valid, K, Kinv):
            def one(r1, r2, a, b):
                x1 = camera.normalize_points(Kinv, a[None])
                x2 = camera.normalize_points(Kinv, b[None])
                X = triangulate_hartley_sturm(
                    r1, r2, x1, x2, cfg.triangulation_iters,
                    cfg.triangulation_eps)[0]
                e1 = jnp.linalg.norm(camera.project_points(r1, K, X[None])[0] - a)
                e2 = jnp.linalg.norm(camera.project_points(r2, K, X[None])[0] - b)
                z1 = camera.transform_points(r1, X[None])[0, 2]
                z2 = camera.transform_points(r2, X[None])[0, 2]
                # parallax-angle gate (see SfMConfig.min_triangulation_angle_deg)
                ray1 = X - camera.camera_center(r1)
                ray2 = X - camera.camera_center(r2)
                cosang = jnp.dot(ray1, ray2) / jnp.maximum(
                    jnp.linalg.norm(ray1) * jnp.linalg.norm(ray2), 1e-12)
                keep = ((e1 <= gate) & (e2 <= gate) & (z1 > 0) & (z2 > 0)
                        & (cosang <= cos_min)
                        & jnp.all(jnp.isfinite(X)))
                return X, keep

            X, keep = jax.vmap(one)(Rt1, Rt2, uv1, uv2)
            return X, keep & valid

        self._jit_tri_rows = jax.jit(tri_rows)

        TRI_K = 8  # max observations per multi-view triangulation

        def tri_multi(Rt, uv, msk, K, Kinv):
            """Batched N-view triangulation: DLT over all observations,
            then Gauss-Newton refinement of the 3D point, then per-obs
            gates. Rt (B, K, 3, 4), uv (B, K, 2), msk (B, K).

            The 2-view widest-baseline triangulation breaks down under
            accumulated pose drift: the two chosen views disagree by the
            full drift across the window and the dual reprojection gate
            mass-rejects (measured 2/326 at a 150-view frontier). The
            N-view solve spreads the residual over every local view —
            drift-consistent points that keep the frontier fed and give
            the global BA long-range constraints. This is the standard
            multi-view DLT [HZ 12.2] the reference's per-pair loop
            approximates one pair at a time (MultiCameraPnP.cpp:308-444).
            """

            def one(Rts, uvs, m):
                x = jax.vmap(lambda a: camera.normalize_points(Kinv, a[None])[0])(uvs)
                # DLT rows: x * P[2] - P[0], y * P[2] - P[1]
                P = Rts                                       # (K, 3, 4) normalized
                r0 = x[:, 0:1] * P[:, 2] - P[:, 0]            # (K, 4)
                r1 = x[:, 1:2] * P[:, 2] - P[:, 1]
                A = jnp.concatenate([r0, r1], 0)              # (2K, 4)
                wA = A * jnp.concatenate([m, m], 0)[:, None]
                AtA = wA.T @ wA
                _, vecs = jnp.linalg.eigh(AtA)
                Xh = vecs[:, 0]
                X = Xh[:3] / jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])

                def gn_step(_, X):
                    # Gauss-Newton on pixel reprojection over all obs
                    pc = jnp.einsum("kij,j->ki", Rts[:, :, :3], X) + Rts[:, :, 3]
                    z = jnp.where(jnp.abs(pc[:, 2:]) < 1e-9, 1e-9, pc[:, 2:])
                    pr = pc[:, :2] / z * K[0, 0] + K[:2, 2]
                    r = (pr - uvs) * m[:, None]               # (K, 2)
                    f = K[0, 0]
                    # d(pr)/dX = f/z * [R0 - x_n R2; R1 - y_n R2]
                    xn = pc[:, 0:1] / z
                    yn = pc[:, 1:2] / z
                    J0 = (Rts[:, 0, :3] - xn * Rts[:, 2, :3]) * (f / z)
                    J1 = (Rts[:, 1, :3] - yn * Rts[:, 2, :3]) * (f / z)
                    J = jnp.concatenate([J0, J1], 0) * \
                        jnp.concatenate([m, m], 0)[:, None]   # (2K, 3)
                    rr = jnp.concatenate([r[:, 0], r[:, 1]], 0)
                    H = J.T @ J + 1e-6 * jnp.eye(3)
                    g = J.T @ rr
                    dX = jnp.linalg.solve(H, g)
                    dX = jnp.where(jnp.all(jnp.isfinite(dX)), dX, 0.0)
                    return X - dX

                X = jax.lax.fori_loop(0, 5, gn_step, X)
                pc = jnp.einsum("kij,j->ki", Rts[:, :, :3], X) + Rts[:, :, 3]
                z = jnp.where(jnp.abs(pc[:, 2:]) < 1e-9, 1e-9, pc[:, 2:])
                pr = pc[:, :2] / z * K[0, 0] + K[:2, 2]
                err = jnp.linalg.norm(pr - uvs, axis=1)
                n = jnp.maximum(jnp.sum(m), 1.0)
                ok_err = jnp.sum((err <= gate) * m) >= n      # every obs in gate
                ok_z = jnp.sum((pc[:, 2] > 0) * m) >= n       # cheirality all
                # parallax: widest pair of camera centers vs point
                C = jax.vmap(camera.camera_center)(Rts)       # (K, 3)
                rays = X[None, :] - C
                rn = rays / jnp.maximum(
                    jnp.linalg.norm(rays, axis=1, keepdims=True), 1e-12)
                cosm = jnp.einsum("ia,ja->ij", rn, rn)
                pairm = (m[:, None] * m[None, :]) > 0
                cmin = jnp.min(jnp.where(pairm, cosm, 1.0))
                keep = (ok_err & ok_z & (cmin <= cos_min)
                        & jnp.all(jnp.isfinite(X)) & (n >= 2))
                return X, keep

            X, keep = jax.vmap(one)(Rt, uv, msk)
            return X, keep

        self._jit_tri_multi = jax.jit(tri_multi)
        self._tri_k = TRI_K

        # Local BA must NOT refine the shared focal: with most cameras
        # frozen it would absorb window-local error into the one global
        # focal and silently corrupt every frozen view. Only the global
        # solves touch it (matching the reference, whose adjustBundle is
        # always global, SfMBundleAdjustmentUtils.cpp:138).
        self._jit_local_ba = jax.jit(lambda poses, free, pts, ci, pi, uv, w, Kx:
            adjust_bundle_sparse(
                poses, free, pts, ci, pi, uv, w, Kx,
                max_iterations=cfg.ba_incremental_iterations,
                function_tolerance=cfg.ba_incremental_tolerance,
                initial_lambda=cfg.ba_initial_lambda,
                share_focal=False))

        # Schur-CG information propagates ~one camera hop per CG
        # iteration through the camera-coupling graph, so the CG depth
        # must scale with the camera count or drift accumulates into
        # loop-scale modes the solver can never reach (measured on a
        # 150-view orbit: cg=32 leaves the final BA cost-capped and the
        # map bent at ATE 0.53; cg=V reaches 0.29). Interval solves keep
        # the ring continuously distributed; the final polish gets a
        # deeper budget still.
        # Every GLOBAL solve is CHUNKED into bounded-length device
        # programs (<= _ba_chunk LM iterations each, ~5 s/iteration at
        # the 500-view map) with host-side continuation: one XLA program
        # executing for minutes trips the TPU worker's execution
        # watchdog ("TPU worker process crashed" — reproduced standalone
        # at 30 LM x 384 CG over 262k observations, while the same solve
        # as shorter programs completes). Each chunk re-enters with the
        # previous chunk's poses/points/K; the Nielsen damping re-adapts
        # within ~2 iterations.
        # calibrated at the config-5 shape (V=5000, 1-2M obs): one LM
        # iteration is ~3-10 s of device time at cg<=128, so 5-iteration
        # chunks stay safely inside the watchdog — but cg=256 programs at
        # V=5000 hang for >10 minutes (a superlinear cliff between
        # cg=128 and cg=256 at that camera count; cg=320 at V=500 is
        # fine), so the CG caps step down for large collections
        self._ba_chunk = 5
        big = self.V > 1000
        self._interval_cg = int(min(max(48, self.V), 96 if big else 192))
        self._jit_global_ba = jax.jit(lambda poses, free, pts, ci, pi, uv, w, Kx:
            adjust_bundle_sparse(
                poses, free, pts, ci, pi, uv, w, Kx,
                max_iterations=self._ba_chunk,
                function_tolerance=cfg.ba_function_tolerance,
                initial_lambda=cfg.ba_initial_lambda,
                share_focal=cfg.ba_share_focal,
                cg_iterations=self._interval_cg,
                huber_delta=cfg.collection_huber_px))

        self._final_cg = int(min(max(64, self.V), 128 if big else 256))
        self._jit_final_ba = jax.jit(lambda poses, free, pts, ci, pi, uv, w, Kx:
            adjust_bundle_sparse(
                poses, free, pts, ci, pi, uv, w, Kx,
                max_iterations=self._ba_chunk,
                function_tolerance=cfg.ba_function_tolerance * 0.1,
                initial_lambda=cfg.ba_initial_lambda,
                share_focal=cfg.ba_share_focal,
                cg_iterations=self._final_cg,
                huber_delta=cfg.collection_huber_px))

    # ------------------------------------------------------------------ #
    # stages
    # ------------------------------------------------------------------ #
    def extract(self, chunk: int = 64):
        """Batched detection over all views, chunked to bound the response
        -map working set (SfM.cpp:141-154 semantics at collection scale)."""
        cfg = self.cfg
        t0 = time.perf_counter()
        parts = []
        for s in range(0, self.V, chunk):
            blk = self.gray[s:s + chunk]
            n = len(blk)
            if n < chunk and self.V > chunk:  # pad: keep one compiled shape
                blk = np.concatenate([blk, np.repeat(blk[-1:], chunk - n, 0)])
            feats = extract_features(
                jnp.asarray(blk),
                max_features=cfg.max_features, desc_bits=cfg.desc_bits,
                pyramid_levels=cfg.pyramid_levels,
                pyramid_scale=cfg.pyramid_scale,
                fast_threshold=cfg.fast_threshold / 255.0,
                score_kind=cfg.detector_score,
                sampling=cfg.descriptor_sampling)
            parts.append(jax.tree.map(lambda x: x[:n], feats))
        self.features = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
        self.feat_xy = np_of(self.features.xy)
        self.feat_valid = np_of(self.features.valid)
        self._timings["features_s"] = time.perf_counter() - t0
        self._log(1, f"extracted features for {self.V} views "
                     f"({self._timings['features_s']:.2f}s)")

    def match(self):
        """Windowed pair matching, chunked; sharded over the mesh when one
        is given (dist/matching.py — the TPU equivalent of the reference's
        std::thread pair fan-out, SfM.cpp:165-211)."""
        cfg = self.cfg
        t0 = time.perf_counter()
        P = len(self.pairs)
        CH = cfg.collection_match_chunk
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            CH = max(CH // n_dev * n_dev, n_dev)
        M = cfg.max_matches
        self.match_idx = np.full((P, M, 2), -1, np.int32)
        self.match_valid = np.zeros((P, M), bool)
        # single-TPU path: the streaming int8 Pallas kernel (O(F*D) HBM
        # instead of the O(F^2) distance matrix; identical match outputs)
        use_pallas = (self.mesh is None and jax.default_backend() != "cpu"
                      and not cfg.cross_check
                      and cfg.max_features % 256 == 0)
        if use_pallas:
            from tpusfm.features.pallas_match import match_pairs_pallas

            jit_local = jax.jit(lambda f, p: match_pairs_pallas(
                f.desc, f.valid, p, ratio=cfg.match_ratio, max_matches=M))
        else:
            jit_local = jax.jit(lambda f, p: match_all_pairs(
                f, p, ratio=cfg.match_ratio, cross_check=cfg.cross_check,
                max_matches=M))
        for s in range(0, P, CH):
            blk = self.pairs[s:s + CH]
            pad = CH - len(blk)
            if pad:
                blk = np.concatenate([blk, np.tile([[0, 1]], (pad, 1))])
            if self.mesh is not None:
                from tpusfm.dist.matching import match_all_pairs_sharded

                m = match_all_pairs_sharded(
                    self.mesh, self.features, jnp.asarray(blk),
                    ratio=cfg.match_ratio, cross_check=cfg.cross_check,
                    max_matches=M)
            else:
                m = jit_local(self.features, jnp.asarray(blk))
            n = len(self.pairs[s:s + CH])
            self.match_idx[s:s + n] = np_of(m.idx)[:n]
            self.match_valid[s:s + n] = np_of(m.valid)[:n]
        self._timings["matching_s"] = time.perf_counter() - t0
        self._log(1, f"matched {P} pairs ({self._timings['matching_s']:.2f}s, "
                     f"{'mesh' if self.mesh is not None else '1 dev'})")
        if cfg.epipolar_prune:
            self.prune_matches()
        # Descriptors are dead weight past this point (tracks consume
        # only feat_xy, which lives host-side) — at config-5 scale they
        # hold 5000 x 1024 x 256 f32 = 5.2 GB of HBM that the global BA
        # needs (observed ResourceExhausted at the first 2M-observation
        # solve with them still resident).
        self.features = "matched (descriptors freed)"

    def prune_matches(self):
        """Per-pair epipolar RANSAC match pruning BEFORE track building
        (legacy PruneMatchesBasedOnF, MultiCameraPnP.cpp:463-485).

        At collection scale this is load-bearing, not a refinement: the
        track graph is a transitive closure, so a single geometrically
        wrong match chains two physical points into ONE track; BA then
        splits the difference across both and the map silently deforms
        (measured 20% inconsistent tracks and 0.9-unit ATE on a 10-unit
        10-view fixture without this pass)."""
        t0 = time.perf_counter()
        P = len(self.pairs)
        CH = 128
        Kj, Kinv = self._K()
        before = int(self.match_valid.sum())
        for s in range(0, P, CH):
            blk = np.arange(s, min(s + CH, P))
            pad = CH - len(blk)
            rows = (np.concatenate([blk, np.zeros(pad, np.int64)])
                    if pad else blk)
            i = self.pairs[rows, 0]
            j = self.pairs[rows, 1]
            idx = self.match_idx[rows]
            msk = self.match_valid[rows]
            uv1 = self.feat_xy[i[:, None], np.clip(idx[:, :, 0], 0, None)]
            uv2 = self.feat_xy[j[:, None], np.clip(idx[:, :, 1], 0, None)]
            keys = jax.random.split(self._split(), CH)
            inl = np_of(self._jit_epi_prune(
                keys, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(msk),
                Kj, Kinv))
            self.match_valid[s:s + len(blk)] = inl[:len(blk)]
        after = int(self.match_valid.sum())
        self._timings["prune_s"] = time.perf_counter() - t0
        self._log(1, f"epipolar prune: {before} -> {after} matches "
                     f"({self._timings['prune_s']:.2f}s)")

    def build_tracks(self):
        """Connected components over match edges -> global track graph.

        Vectorized pointer-jumping label propagation: every (view, feat)
        node takes the min label over its match neighbors, then labels
        chase their own targets (lab = lab[lab]), doubling the propagation
        distance per sweep — O(E) work per sweep, O(log diameter) sweeps.
        Tracks observing one view twice are cut at that view (the
        ambiguous observations are dropped — the reference's merge would
        have chained them into one bad point, SfM.cpp:566-587).
        """
        t0 = time.perf_counter()
        F = self.cfg.max_features
        vi = self.pairs[:, 0:1].astype(np.int64)   # (P, 1)
        vj = self.pairs[:, 1:2].astype(np.int64)
        li = self.match_idx[:, :, 0].astype(np.int64)
        ri = self.match_idx[:, :, 1].astype(np.int64)
        ok = self.match_valid
        a = (vi * F + np.clip(li, 0, F - 1))[ok]   # (E,)
        b = (vj * F + np.clip(ri, 0, F - 1))[ok]

        lab = np.arange(self.V * F, dtype=np.int64)
        for _ in range(64):
            prev = lab
            nxt = lab.copy()
            np.minimum.at(nxt, a, lab[b])
            np.minimum.at(nxt, b, lab[a])
            nxt = nxt[nxt]           # pointer jumping
            nxt = nxt[nxt]
            lab = nxt
            if np.array_equal(lab, prev):
                break

        nodes = np.unique(np.concatenate([a, b]))
        roots = lab[nodes]
        track_of_node, obs_track = np.unique(roots, return_inverse=True)
        self.T = len(track_of_node)
        self.obs_track = obs_track.astype(np.int64)
        self.obs_view = (nodes // F).astype(np.int32)
        self.obs_feat = (nodes % F).astype(np.int32)
        self.obs_uv = self.feat_xy[self.obs_view, self.obs_feat].astype(np.float32)
        self.obs_alive = np.ones(len(nodes), bool)

        # cut per-view conflicts: a track with two features in one view
        key = self.obs_track * self.V + self.obs_view
        _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
        self.obs_alive &= counts[inv] == 1

        # drop tracks left with < 2 observations
        live = np.bincount(self.obs_track[self.obs_alive], minlength=self.T)
        self.obs_alive &= live[self.obs_track] >= 2

        self.track_xyz = np.zeros((self.T, 3), np.float32)
        self.track_ok = np.zeros(self.T, bool)
        self.node2track = np.full((self.V, F), -1, np.int64)
        keep = self.obs_alive
        self.node2track[self.obs_view[keep], self.obs_feat[keep]] = \
            self.obs_track[keep]
        self._timings["tracks_s"] = time.perf_counter() - t0
        self._log(1, f"track graph: {self.T} tracks, "
                     f"{int(self.obs_alive.sum())} observations "
                     f"({self._timings['tracks_s']:.2f}s)")

    # ------------------------------------------------------------------ #
    def _pair_coords(self, p: int):
        i, j = self.pairs[p]
        idx = self.match_idx[p]
        v = self.match_valid[p]
        uv1 = self.feat_xy[i, np.clip(idx[:, 0], 0, None)]
        uv2 = self.feat_xy[j, np.clip(idx[:, 1], 0, None)]
        return (jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(v))

    def find_baseline(self) -> bool:
        """Baseline pair: ascending homography-inlier ratio among candidate
        pairs, first pair passing the pose gates wins (SfM.cpp:215-321,
        sortViewsForBaseline :333-364)."""
        cfg = self.cfg
        t0 = time.perf_counter()
        counts = self.match_valid.sum(1)
        cand = np.nonzero(counts >= cfg.min_point_count_for_homography)[0]
        if len(cand) == 0:
            return False
        # H-inlier ratio, chunked batch
        ratios = np.full(len(cand), 2.0, np.float64)
        CH = 128
        for s in range(0, len(cand), CH):
            blk = cand[s:s + CH]
            pad = CH - len(blk)
            rows = np.concatenate([blk, np.zeros(pad, blk.dtype)]) if pad else blk
            i = self.pairs[rows, 0]
            j = self.pairs[rows, 1]
            idx = self.match_idx[rows]
            msk = self.match_valid[rows]
            uv1 = self.feat_xy[i[:, None], np.clip(idx[:, :, 0], 0, None)]
            uv2 = self.feat_xy[j[:, None], np.clip(idx[:, :, 1], 0, None)]
            keys = jax.random.split(self._split(), CH)
            cnt = np_of(self._jit_h_rank(keys, jnp.asarray(uv1),
                                         jnp.asarray(uv2), jnp.asarray(msk)))
            ratios[s:s + len(blk)] = cnt[:len(blk)] / np.maximum(
                msk.sum(1)[:len(blk)], 1)
        order = cand[np.argsort(ratios)]

        # The reference iterates over EVERY pair in ascending H-inlier
        # order until one passes the pose gates (SfM.cpp:236-320). A
        # fixed small try budget breaks closed-loop collections whose
        # widest-window pairs alias under repetitive texture: all the
        # best-ranked (widest) pairs fail the inlier-ratio gate and the
        # narrow, matchable pairs are never reached.
        Kj, Kinv = self._K()
        for p in order:
            i, j = map(int, self.pairs[p])
            uv1, uv2, msk = self._pair_coords(p)
            res = self._jit_two_view(self._split(), uv1, uv2, msk, Kj, Kinv)
            if not bool(res.ok) or float(res.inlier_ratio) < \
                    cfg.pose_inliers_minimal_ratio:
                self._log(0, f"baseline {i},{j}: pose gate failed "
                             f"(ratio {float(res.inlier_ratio):.2f})")
                continue
            Rt1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
            B = uv1.shape[0]
            X, keep = self._jit_tri_rows(
                jnp.broadcast_to(Rt1, (B, 3, 4)),
                jnp.broadcast_to(res.Rt, (B, 3, 4)),
                uv1, uv2, jnp.asarray(res.inliers), Kj, Kinv)
            keep_np = np_of(keep)
            n_seed = int(keep_np.sum())
            if n_seed < cfg.min_point_count_for_homography // 2:
                self._log(0, f"baseline {i},{j}: only {n_seed} seed points")
                continue
            # map kept match slots -> tracks via the left-view node
            fi = self.match_idx[p, :, 0]
            tr = self.node2track[i, np.clip(fi, 0, None)]
            sel = keep_np & (tr >= 0)
            self.track_xyz[tr[sel]] = np_of(X)[sel]
            self.track_ok[tr[sel]] = True
            self.poses[i] = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
            self.poses[j] = np_of(res.Rt)
            self.pose_valid[[i, j]] = True
            self.reg_order = [i, j]
            self._timings["baseline_s"] = time.perf_counter() - t0
            self._log(1, f"baseline {i},{j}: {int(sel.sum())} seed tracks "
                         f"(pose inliers {float(res.inlier_ratio):.2f})")
            return True
        return False

    # ------------------------------------------------------------------ #
    def _pnp_view(self, v: int) -> bool:
        """Register view v from its 2D-3D track correspondences
        (SfM.cpp:471-528 + SfMStereoUtilities.cpp:208-243 + the legacy
        sanity gates MultiCameraPnP.cpp:287-299)."""
        cfg = self.cfg
        sel = np.nonzero((self.obs_view == v) & self.obs_alive
                         & self.track_ok[self.obs_track])[0]
        n = len(sel)
        if n < 8:
            return False
        cap = _pow2(n, 256)
        X = np.zeros((cap, 3), np.float32)
        uv = np.zeros((cap, 2), np.float32)
        msk = np.zeros(cap, bool)
        X[:n] = self.track_xyz[self.obs_track[sel]]
        uv[:n] = self.obs_uv[sel]
        msk[:n] = True
        Kj, Kinv = self._K()
        res = self._jit_pnp(self._split(), jnp.asarray(X), jnp.asarray(uv),
                            jnp.asarray(msk), Kj, Kinv)
        Rt = np_of(res.Rt)
        n_inl = int(np_of(res.inliers).sum())
        ok = (bool(res.ok)
              and n_inl >= max(n // 5, 6)
              and np.linalg.norm(Rt[:, 3]) <= cfg.max_translation_norm
              and abs(np.linalg.det(Rt[:, :3]) - 1.0) < 1e-2)
        self._log(0, f"view {v}: {n} 2D-3D matches, PnP ratio "
                     f"{float(res.inlier_ratio):.2f}, ok={ok}")
        if not ok:
            return False
        # PnP outliers are wrong track assignments — cut those observations
        inl = np_of(res.inliers)[:n]
        self.obs_alive[sel[~inl]] = False
        self.poses[v] = Rt
        self.pose_valid[v] = True
        self.reg_order.append(v)
        return True

    def _centers(self) -> np.ndarray:
        centers = np.zeros((self.V, 3), np.float32)
        for w in np.nonzero(self.pose_valid)[0]:
            Rt = self.poses[w]
            centers[w] = -Rt[:, :3].T @ Rt[:, 3]
        return centers

    def _tri_tracks(self, tr_ids: np.ndarray) -> int:
        """Multi-view triangulate the given tracks from ALL their alive
        registered observations (up to _tri_k, evenly spread over the
        view range); writes track_xyz/track_ok. Returns accepted count."""
        K_TRI = self._tri_k
        tr_ids = np.asarray(np.sort(tr_ids), np.int64)
        if len(tr_ids) == 0:
            return 0
        tmask = np.zeros(self.T, bool)
        tmask[tr_ids] = True
        sel = np.nonzero(self.obs_alive & self.pose_valid[self.obs_view]
                         & tmask[self.obs_track])[0]
        order = np.lexsort((self.obs_view[sel], self.obs_track[sel]))
        sel = sel[order]
        st = self.obs_track[sel]
        starts = np.searchsorted(st, tr_ids)
        ends = np.searchsorted(st, tr_ids, side="right")
        c = ends - starts
        tr_ids = tr_ids[c >= 2]
        starts = starts[c >= 2]
        c = c[c >= 2]
        B = len(tr_ids)
        if B == 0:
            return 0
        # per-track observation slots: all of them when c <= K, evenly
        # spread over the view-sorted range when c > K (max parallax)
        lin = np.arange(K_TRI)
        pos = np.where(
            (c >= K_TRI)[:, None],
            np.round(lin[None, :] * (c[:, None] - 1)
                     / max(K_TRI - 1, 1)).astype(np.int64),
            np.minimum(lin[None, :], c[:, None] - 1))
        oidx = sel[starts[:, None] + pos]                       # (B, K)
        msk = (lin[None, :] < np.minimum(c, K_TRI)[:, None])
        Kj, Kinv = self._K()
        # chunk the device calls: one program over every pool track of a
        # 5000-view collection (500k+ rows of batched eigh + GN) runs
        # long enough to trip the TPU worker watchdog
        CH = 65536
        n_ok = 0
        for s0 in range(0, B, CH):
            blk = slice(s0, min(s0 + CH, B))
            n = blk.stop - blk.start
            cap = _pow2(n, 256)

            def pad(x, dtype):
                out = np.zeros((cap,) + x.shape[1:], dtype)
                out[:n] = x[blk]
                return jnp.asarray(out)

            Rt = pad(self.poses[self.obs_view[oidx]], np.float32)
            uv = pad(self.obs_uv[oidx], np.float32)
            mk = pad(msk.astype(np.float32), np.float32)
            X, keep = self._jit_tri_multi(Rt, uv, mk, Kj, Kinv)
            keep_np = np_of(keep)[:n]
            ids = tr_ids[blk][keep_np]
            self.track_xyz[ids] = np_of(X)[:n][keep_np]
            self.track_ok[ids] = True
            n_ok += int(keep_np.sum())
        return n_ok

    def _triangulate_new(self, v: int) -> int:
        """Triangulate tracks that gained an observation with the
        registration of v and are not yet in the map, from all their
        registered observations (legacy TriangulatePointsBetweenViews
        runs v against EVERY good view, MultiCameraPnP.cpp:308-444 —
        the N-view solve is the batched equivalent)."""
        sel = self.obs_alive & self.pose_valid[self.obs_view]
        cnt = np.bincount(self.obs_track[sel], minlength=self.T)
        in_v = np.nonzero((self.obs_view == v) & self.obs_alive)[0]
        tr = np.unique(self.obs_track[in_v])
        tr = tr[(~self.track_ok[tr]) & (cnt[tr] >= 2)]
        if len(tr) == 0:
            return 0
        n_ok = self._tri_tracks(tr)
        self._log(0, f"  triangulate: {n_ok}/{len(tr)} candidates passed "
                     f"the {self.cfg.min_reprojection_error:.0f}px gate")
        return n_ok

    def _retriangulate(self) -> int:
        """Re-triangulate pool tracks (never triangulated, or pruned back)
        that have >= 2 alive registered observations — runs after every
        global BA, when the poses are at their best. The reference's
        analog is re-running triangulation of a view pair after pose
        refinement (SfM.cpp:413-461); here it recovers tracks the
        interleaved pruning sent back to the pool."""
        sel = self.obs_alive & self.pose_valid[self.obs_view]
        cnt = np.bincount(self.obs_track[sel], minlength=self.T)
        tr = np.nonzero((~self.track_ok) & (cnt >= 2))[0]
        if len(tr) == 0:
            return 0
        return self._tri_tracks(tr)

    # ------------------------------------------------------------------ #
    def _ba(self, free_views: np.ndarray, global_ba: bool,
            final: bool = False) -> None:
        """COO bundle adjustment over the tracks observed by free_views.

        Local mode optimizes the sliding camera window against frozen
        older cameras; global mode frees every registered camera and
        shards point blocks over the mesh when one is given."""
        if global_ba:
            # cut gross outliers BEFORE the solve: LM over a heavy-tailed
            # residual set rejects its first trust-region steps and
            # stalls. The FINAL solves prune at a wider gate — closure
            # observations legitimately carry the whole accumulated loop
            # drift until the deep Huber solve absorbs it.
            self._prune_observations(
                self.cfg.collection_final_prune_factor if final else 1.0)
        reg = self.pose_valid
        free_mask = np.zeros(self.V, bool)
        free_mask[free_views] = True
        sel = (self.obs_alive & self.track_ok[self.obs_track]
               & reg[self.obs_view])
        if global_ba:
            t_in = self.track_ok.copy()
        else:
            t_in = np.zeros(self.T, bool)
            touched = self.obs_track[sel & free_mask[self.obs_view]]
            t_in[touched] = True
            t_in &= self.track_ok
        o_in = np.nonzero(sel & t_in[self.obs_track])[0]
        t_ids = np.unique(self.obs_track[o_in])
        if len(t_ids) < 8 or len(o_in) < 24:
            return
        remap = np.full(self.T, -1, np.int64)
        remap[t_ids] = np.arange(len(t_ids))

        n_pts, n_obs = len(t_ids), len(o_in)
        K = np_of(self.intr.K)
        cap_p = _pow2(n_pts, 256)
        if global_ba and self.mesh is not None:
            n_dev = self.mesh.devices.size
            cap_p = -(-cap_p // n_dev) * n_dev
        cap_o = _pow2(n_obs, 1024)
        pts = np.zeros((cap_p, 3), np.float32)
        pts[:n_pts] = self.track_xyz[t_ids]
        ci = np.zeros(cap_o, np.int32)
        pi = np.zeros(cap_o, np.int32)
        uv = np.zeros((cap_o, 2), np.float32)
        w = np.zeros(cap_o, np.float32)
        ci[:n_obs] = self.obs_view[o_in]
        pi[:n_obs] = remap[self.obs_track[o_in]]
        uv[:n_obs] = self.obs_uv[o_in]
        w[:n_obs] = 1.0
        if global_ba and self.mesh is not None:
            from tpusfm.dist.sparse_ba import adjust_bundle_sparse_sharded

            out_Rt, out_pts, newK, summary = adjust_bundle_sparse_sharded(
                self.mesh, jnp.asarray(self.poses), jnp.asarray(free_mask),
                pts, ci, pi, uv, w, jnp.asarray(K),
                max_iterations=(2 * self.cfg.ba_max_iterations if final
                                else self.cfg.ba_max_iterations),
                function_tolerance=(self.cfg.ba_function_tolerance * 0.1
                                    if final else
                                    self.cfg.ba_function_tolerance),
                initial_lambda=self.cfg.ba_initial_lambda,
                share_focal=self.cfg.ba_share_focal,
                cg_iterations=(self._final_cg if final
                               else self._interval_cg),
                huber_delta=self.cfg.collection_huber_px)
        elif global_ba:
            # host-side continuation over bounded-length device chunks
            # (see _jit_global_ba/_jit_final_ba) up to the iteration
            # budget
            fn = self._jit_final_ba if final else self._jit_global_ba
            budget = (2 if final else 1) * self.cfg.ba_max_iterations
            poses_j = jnp.asarray(self.poses)
            pts_j = jnp.asarray(pts)
            K_j = jnp.asarray(K)
            free_j = jnp.asarray(free_mask)
            ci_j, pi_j = jnp.asarray(ci), jnp.asarray(pi)
            uv_j, w_j = jnp.asarray(uv), jnp.asarray(w)
            total_it = 0
            initial_cost = prev_cost = None
            while total_it < budget:
                out_Rt, out_pts, newK, summary = fn(
                    poses_j, free_j, pts_j, ci_j, pi_j, uv_j, w_j, K_j)
                it = int(summary.iterations)
                total_it += it
                if initial_cost is None:
                    initial_cost = summary.initial_cost
                cost = float(summary.final_cost)
                poses_j, pts_j, K_j = out_Rt, out_pts, newK
                if it < self._ba_chunk:
                    break                      # converged inside the chunk
                if prev_cost is not None and cost >= prev_cost * (1 - 1e-6):
                    break                      # chunk-to-chunk stall
                prev_cost = cost
            summary = summary._replace(initial_cost=initial_cost,
                                       iterations=jnp.asarray(total_it))
        else:
            out_Rt, out_pts, newK, summary = self._jit_local_ba(
                jnp.asarray(self.poses), jnp.asarray(free_mask),
                jnp.asarray(pts), jnp.asarray(ci), jnp.asarray(pi),
                jnp.asarray(uv), jnp.asarray(w), jnp.asarray(K))
        self._ba_iters += int(summary.iterations)
        self.poses = np.where(free_mask[:, None, None], np_of(out_Rt),
                              self.poses).astype(np.float32)
        self.track_xyz[t_ids] = np_of(out_pts)[:n_pts]
        if global_ba and self.cfg.ba_share_focal:
            newK = np_of(newK)
            self.intr = Intrinsics.create(float(newK[0, 0]), float(K[0, 2]),
                                          float(K[1, 2]))
        if global_ba:
            self._prune_observations()
        self._log(0 if not global_ba else 1,
                  f"{'global' if global_ba else 'local'} BA: "
                  f"{float(summary.initial_cost):.1f} -> "
                  f"{float(summary.final_cost):.1f} in "
                  f"{int(summary.iterations)} iters "
                  f"({n_pts} pts, {n_obs} obs)")

    def _prune_observations(self, factor: float = 1.0):
        """Cut observations whose reprojection exceeds factor x the
        triangulation gate after a global BA; tracks left with < 2
        registered alive observations lose their point and go back to the
        triangulation pool (the collection-scale analog of the
        reference's per-merge reprojection confirmation)."""
        sel = np.nonzero(self.obs_alive & self.track_ok[self.obs_track]
                         & self.pose_valid[self.obs_view])[0]
        if not len(sel):
            return
        K = np_of(self.intr.K)
        Rt = self.poses[self.obs_view[sel]]
        X = self.track_xyz[self.obs_track[sel]]
        pc = np.einsum("oij,oj->oi", Rt[:, :, :3], X) + Rt[:, :, 3]
        z = np.where(np.abs(pc[:, 2:]) < 1e-9, 1e-9, pc[:, 2:])
        pr = pc[:, :2] / z * K[0, 0] + K[:2, 2]
        err = np.linalg.norm(pr - self.obs_uv[sel], axis=1)
        bad = (err > factor * self.cfg.min_reprojection_error) | (pc[:, 2] <= 0)
        self.obs_alive[sel[bad]] = False
        live = np.bincount(
            self.obs_track[self.obs_alive & self.pose_valid[self.obs_view]],
            minlength=self.T)
        lost = self.track_ok & (live < 2)
        self.track_ok[lost] = False
        if bad.sum():
            self._log(0, f"pruned {int(bad.sum())} observations, "
                         f"{int(lost.sum())} tracks back to pool")

    # ------------------------------------------------------------------ #
    def run(self) -> CollectionReconstruction:
        cfg = self.cfg
        t0 = time.perf_counter()
        if self.features is None:
            self.extract()
        if self.match_idx is None:
            self.match()
        if self.track_xyz is None:
            self.build_tracks()
        t1 = time.perf_counter()
        if not self.find_baseline():
            raise RuntimeError(
                "no baseline pair could seed the reconstruction "
                "(reference aborts the same way, MultiCameraPnP.cpp:144-147)")
        self._triangulate_new(self.reg_order[1])
        self._ba(np.array(self.reg_order), global_ba=False)

        def global_round(level: int):
            self._ba(np.nonzero(self.pose_valid)[0], global_ba=True)
            n_re = self._retriangulate()
            if n_re:
                self._log(level, f"retriangulated {n_re} pool tracks")

        since_global = 0
        stalled = 0
        failed: set = set()
        while True:
            counts = np.bincount(
                self.obs_view[self.obs_alive & self.track_ok[self.obs_track]],
                minlength=self.V)
            counts[self.pose_valid] = 0
            for v in failed:
                counts[v] = 0
            v = int(np.argmax(counts))
            if counts[v] < 8:
                # The frontier stalled — every candidate failed PnP or
                # starved. PnP failures at a long-running frontier are
                # usually accumulated drift (local BA windows cannot fix
                # the whole chain): consolidate with a global BA +
                # retriangulation and RETRY the failed views once. Only a
                # stall that repeats immediately after a fresh global
                # round is terminal.
                if stalled >= 1 or not failed:
                    break
                self._log(1, f"frontier stalled at {len(failed)} failed views "
                             "- global consolidation + retry")
                global_round(0)
                failed.clear()
                since_global = 0
                stalled += 1
                continue
            if not self._pnp_view(v):
                failed.add(v)
                continue
            failed.clear()
            stalled = 0
            n_new = self._triangulate_new(v)
            self._log(0, f"view {v}: +{n_new} tracks triangulated")
            free = np.array(self.reg_order[-cfg.collection_local_ba_cams:])
            self._ba(free, global_ba=False)
            since_global += 1
            if since_global >= cfg.collection_global_ba_interval:
                global_round(0)
                failed.clear()     # a better map may revive failed views
                since_global = 0

        # final polish: deep-CG global BA, recover pruned tracks at the
        # refined poses, then one more deep pass over the completed map
        self._ba(np.nonzero(self.pose_valid)[0], global_ba=True, final=True)
        n_re = self._retriangulate()
        if n_re:
            self._log(1, f"retriangulated {n_re} pool tracks")
        self._ba(np.nonzero(self.pose_valid)[0], global_ba=True, final=True)
        self._timings["solve_s"] = time.perf_counter() - t1
        self._timings["total_s"] = time.perf_counter() - t0
        self._timings["ba_iters"] = self._ba_iters
        return self._result()

    # ------------------------------------------------------------------ #
    def mean_reprojection_error(self) -> float:
        sel = (self.obs_alive & self.track_ok[self.obs_track]
               & self.pose_valid[self.obs_view])
        if not sel.sum():
            return float("inf")
        K = np_of(self.intr.K)
        o = np.nonzero(sel)[0]
        Rt = self.poses[self.obs_view[o]]
        X = self.track_xyz[self.obs_track[o]]
        pc = np.einsum("oij,oj->oi", Rt[:, :, :3], X) + Rt[:, :, 3]
        z = np.where(np.abs(pc[:, 2:]) < 1e-9, 1e-9, pc[:, 2:])
        pr = pc[:, :2] / z * K[0, 0] + K[:2, 2]
        return float(np.linalg.norm(pr - self.obs_uv[o], axis=1).mean())

    def _result(self) -> CollectionReconstruction:
        ok = self.track_ok
        pid = np.full(self.T, -1, np.int64)
        pid[ok] = np.arange(int(ok.sum()))
        o = np.nonzero(self.obs_alive & ok[self.obs_track]
                       & self.pose_valid[self.obs_view])[0]
        err = self.mean_reprojection_error()
        # vertex colors: image intensity at the first observation
        xyz = self.track_xyz[ok]
        rgb = np.full((len(xyz), 3), 200, np.uint8)
        first = {}
        for oi in o:
            t = pid[self.obs_track[oi]]
            if t not in first:
                first[t] = oi
        for t, oi in first.items():
            u, vv = self.obs_uv[oi]
            ui = int(np.clip(round(u), 0, self.W - 1))
            vi_ = int(np.clip(round(vv), 0, self.H - 1))
            g = int(self.gray[self.obs_view[oi], vi_, ui] * 255)
            rgb[t] = (g, g, g)
        self._log(1, f"done: {len(xyz)} points, "
                     f"{int(self.pose_valid.sum())}/{self.V} cameras, "
                     f"mean reprojection error {err:.3f}px, "
                     f"{self._timings.get('total_s', 0.0):.2f}s")
        return CollectionReconstruction(
            poses=self.poses.copy(), pose_valid=self.pose_valid.copy(),
            xyz=xyz.copy(), rgb=rgb,
            obs_point=pid[self.obs_track[o]].astype(np.int32),
            obs_view=self.obs_view[o].copy(), obs_feat=self.obs_feat[o].copy(),
            K=np_of(self.intr.K), mean_reprojection_error=err,
            stats=dict(self._timings),
        )
