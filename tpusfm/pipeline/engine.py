"""Fused device-resident incremental SfM engine.

Round-1 profiling showed the host-driven loop (pipeline/incremental.py)
is bound by device->host transfer latency, not TPU compute: on the target
TPU every scalar fetch costs ~25-170 ms, and the classic loop performs
dozens per reconstruction (gate booleans, merge bookkeeping, per-stage
numpy pulls). This engine is the TPU-first answer: the ENTIRE incremental
state machine — baseline-pair selection (SfM.cpp:215-321), the add-view
loop (SfM.cpp:366-469), 2D-3D lookup (SfM.cpp:471-528), cloud merging
(SfM.cpp:530-629) and per-view bundle adjustment (SfM.cpp:324-330) — runs
as ONE jitted XLA program with lax control flow over fixed-shape masked
state. The host dispatches a handful of async calls and fetches the final
reconstruction with a single batched device_get.

Track graph on device:
  xyz        (CAP+1, 3)  map points; row CAP is a write-trash row
  obs        (CAP+1, V)  feature index of point n in view v, -1 sentinel
  feat2point (V, F+1)    inverse map; column F is a write-trash column
  n_points   scalar      live prefix length (points only ever append)

Every data-dependent decision of the reference (which pair seeds, which
view registers next, every acceptance gate) is computed on device; a
failed gate routes its writes to the trash row/column instead of
branching. Behavioral parity notes cite the reference file:line next to
each gate below.
"""
from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusfm import camera
from tpusfm.ba.lm import BAProblem, lm_solve
from tpusfm.config import EssentialDecomposition, SfMConfig
from tpusfm.geometry.essential import (
    essential_from_poses,
    find_camera_from_match,
    sampson_error,
)
from tpusfm.geometry.pnp import find_camera_pose_2d3d
from tpusfm.geometry.homography import find_homography_inliers
from tpusfm.geometry.triangulation import triangulate_views

_EPS = 1e-12
_INF = jnp.inf

# stats row layout (one row per registration attempt; row 0 = baseline)
S_VIEW, S_N2D3D, S_RATIO, S_OK, S_NEW, S_MERGED, S_DROPPED, S_BA0, S_BA1, S_BAIT = range(10)
_STATS_COLS = 10


class EngineState(NamedTuple):
    xyz: jnp.ndarray          # (CAP+1, 3)
    obs: jnp.ndarray          # (CAP+1, V) int32
    feat2point: jnp.ndarray   # (V, F+1) int32
    n_points: jnp.ndarray     # () int32
    poses: jnp.ndarray        # (V, 3, 4)
    pose_valid: jnp.ndarray   # (V,) bool
    done: jnp.ndarray         # (V,) bool
    good: jnp.ndarray         # (V,) bool
    focal: jnp.ndarray        # () f32
    stats: jnp.ndarray        # (V+1, _STATS_COLS) f32


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class FusedEngine:
    """Compiles and runs the device-resident reconstruction.

    One instance per (V, H, W, config) — all shapes are static. The public
    surface is :meth:`run`, which takes host grayscale images and returns
    the fetched reconstruction dict; everything in between stays on device.
    """

    def __init__(self, cfg: SfMConfig, V: int, H: int, W: int,
                 f: float, cx: float, cy: float):
        self.cfg = cfg
        self.V, self.H, self.W = V, H, W
        self.F = cfg.max_features
        self.M = cfg.max_matches
        self.CAP = cfg.engine_point_capacity
        self.PNP_CAP = min(cfg.engine_pnp_capacity, self.F)
        self.f0, self.cx, self.cy = float(f), float(cx), float(cy)

        # Static hypothesis budgets honoring the reference's RANSAC
        # confidences (prob 0.999 @ SfMStereoUtilities.cpp:97, conf 0.99 @
        # :226): the classic N = log(1-p)/log(1-w^k) bound at the epipolar
        # inlier rates ratio-tested matching yields in practice (w~0.75
        # for E, w~0.6 for PnP) is a floor under the configured batch size.
        from tpusfm.ransac import adaptive_num_hypotheses

        self.E_HYP = max(cfg.ransac_hypotheses,
                         adaptive_num_hypotheses(0.75, 8, cfg.essential_prob))
        self.PNP_HYP = max(cfg.pnp_hypotheses,
                           adaptive_num_hypotheses(0.6, 6, cfg.pnp_confidence))

        pairs = [(i, j) for i in range(V) for j in range(i + 1, V)]
        self.pairs_list = pairs
        self.P = len(pairs)
        self._pairs = jnp.asarray(np.array(pairs, np.int32))             # (P, 2)
        pr = np.full((V, V), self.P, np.int32)                            # trash row P
        for n, (a, b) in enumerate(pairs):
            pr[a, b] = n
        self._pair_row = jnp.asarray(pr)
        self._build_programs()
        self.timings = {}
        self._compile_futures = None

    # ------------------------------------------------------------------ #
    # small helpers (traced)
    # ------------------------------------------------------------------ #
    def _K(self, focal):
        z = jnp.zeros((), jnp.float32)
        o = jnp.ones((), jnp.float32)
        return jnp.stack([
            jnp.stack([focal, z, jnp.full((), self.cx)]),
            jnp.stack([z, focal, jnp.full((), self.cy)]),
            jnp.stack([z, z, o]),
        ])

    def _Kinv(self, focal):
        z = jnp.zeros((), jnp.float32)
        o = jnp.ones((), jnp.float32)
        inv_f = 1.0 / focal
        return jnp.stack([
            jnp.stack([inv_f, z, -self.cx * inv_f]),
            jnp.stack([z, inv_f, -self.cy * inv_f]),
            jnp.stack([z, z, o]),
        ])

    def _pair_uv(self, feat_xy, match_idx, p):
        """Aligned (uv_a, uv_b) for pair row p in canonical (a < b) order."""
        idx = match_idx[p]
        a = self._pairs[p, 0]
        b = self._pairs[p, 1]
        uv_a = feat_xy[a][jnp.maximum(idx[:, 0], 0)]
        uv_b = feat_xy[b][jnp.maximum(idx[:, 1], 0)]
        return uv_a, uv_b

    # ------------------------------------------------------------------ #
    # on-device cloud merge (SfM::mergeNewPointCloud, SfM.cpp:530-629)
    # ------------------------------------------------------------------ #
    def _merge_points(self, st: EngineState, xyz_new, keep, vi, vj, fi, fj,
                      right_of, rdist, left_of, feat_xy):
        """Merge one batch of freshly triangulated points into the map.

        Reference semantics (SfM.cpp:544-601, constants :50-51):
          1. a new point within MERGE_CLOUD_POINT_MIN_MATCH_DISTANCE of an
             existing point, CONFIRMED by a 2D feature match of distance
             < MERGE_CLOUD_FEATURE_MIN_MATCH_DISTANCE between their
             originating views, merges (adds its observations);
          2. close but unconfirmed points are dropped (the reference adds a
             point only when `not foundAnyMatchingExistingViews and not
             foundMatching3DPoint`, SfM.cpp:596-600);
          3. everything else appends as a new point.
        Plus the exact-feature fast path: a point whose feature is already
        claimed in feat2point extends that track directly (same outcome
        the reference reaches through 1., since a shared feature implies a
        coincident 3D point).

        Cross-view strengthening (legacy MultiCameraPnP.cpp:393-441): each
        appended point also scans the match matrix from both originating
        features into every other view and claims unowned matching
        features there, extending tracks beyond the triangulating pair.
        """
        cfg = self.cfg
        V, CAP, M, F = self.V, self.CAP, keep.shape[0], self.F
        live = jnp.arange(CAP + 1) < st.n_points

        # 1. nearest live map point
        d2 = jnp.sum((xyz_new[:, None, :] - st.xyz[None, :, :]) ** 2, -1)   # (M, CAP+1)
        d2 = jnp.where(live[None, :], d2, _INF)
        ne = jnp.argmin(d2, axis=1).astype(jnp.int32)
        dmin2 = jnp.min(d2, axis=1)
        close = dmin2 < cfg.merge_point_min_match_distance ** 2

        # 2. 2D feature-match confirmation against point `ne`
        obs_ne = st.obs[ne]                                                  # (M, V)

        def confirm(v_new, f_new):
            # does any view w of obs_ne hold a feature matched (distance <
            # MERGE_CLOUD_FEATURE_MIN_MATCH_DISTANCE) to (v_new, f_new)?
            w = jnp.arange(V)
            a = jnp.minimum(v_new, w)
            b = jnp.maximum(v_new, w)
            p = self._pair_row[a, b]                                         # (V,)
            new_is_left = v_new < w
            lf = jnp.where(new_is_left[None, :], f_new[:, None], obs_ne)     # (M, V)
            rf = jnp.where(new_is_left[None, :], obs_ne, f_new[:, None])
            lf_s = jnp.clip(lf, 0, F)
            hit = (
                (obs_ne >= 0)
                & (w[None, :] != v_new)
                & (right_of[p[None, :], lf_s] == rf)
                & (rdist[p[None, :], lf_s] < cfg.merge_feature_min_match_distance)
            )
            return jnp.any(hit, axis=1)

        confirmed = confirm(vi, fi) | confirm(vj, fj)

        # 3. exact-feature claims
        pi = st.feat2point[vi, jnp.clip(fi, 0, F)]
        pj = st.feat2point[vj, jnp.clip(fj, 0, F)]

        # 3b. transitive-feature claims — the legacy "strengthening" pass
        # (MultiCameraPnP.cpp:393-441): if the new point's feature matches,
        # through some other view w, a feature that already references a
        # map point, attach to that point instead of appending.
        trans = jnp.full((keep.shape[0],), -1, jnp.int32)
        if cfg.cross_view_strengthen:
            # one batched scan over all hop views w (the unrolled per-view
            # Python loop multiplied the traced graph by 2V); the hop match
            # must be strong (strengthen_max_match_distance bound)
            wv = jnp.arange(V)

            def partner_all(v_new, f_new):
                # v_new scalar view index, f_new (M,) -> (p3d, hit) (M, V)
                a = jnp.minimum(v_new, wv)                            # (V,)
                b = jnp.maximum(v_new, wv)
                p = self._pair_row[a, b][None, :]                     # (1, V)
                fsafe = jnp.clip(f_new, 0, F)[:, None]                # (M, 1)
                new_is_left = (v_new < wv)[None, :]                   # (1, V)
                fw = jnp.where(new_is_left, right_of[p, fsafe], left_of[p, fsafe])
                d = jnp.where(new_is_left, rdist[p, fsafe],
                              rdist[p, jnp.clip(fw, 0, F)])
                fw = jnp.where((v_new == wv)[None, :], -1, fw)
                p3d = st.feat2point[wv[None, :], jnp.clip(fw, 0, F)]
                hit = ((fw >= 0) & (p3d >= 0)
                       & ((wv != vi) & (wv != vj))[None, :]
                       & (d < cfg.strengthen_max_match_distance))
                return p3d, hit

            p3d_i, hit_i = partner_all(vi, fi)
            p3d_j, hit_j = partner_all(vj, fj)

            # Geometric confirmation of every hop candidate: the claimed
            # map point must reproject within the triangulation gate in
            # BOTH originating views. A descriptor-only hop chains wrong
            # tracks on repetitive texture (each wrong attach corrupts a
            # track permanently and BA cannot recover); the reference's
            # legacy scan has the same failure mode, we add the check the
            # rest of the pipeline already applies to triangulated points
            # (SfMStereoUtilities.cpp:184-190).
            uv_i = feat_xy[vi, jnp.clip(fi, 0, F - 1)]                 # (M, 2)
            uv_j = feat_xy[vj, jnp.clip(fj, 0, F - 1)]
            g2 = cfg.min_reprojection_error ** 2
            pp = jnp.array([self.cx, self.cy], jnp.float32)

            def reproj_ok(p3d):
                X = st.xyz[jnp.clip(p3d, 0, CAP)]                       # (M, V, 3)

                def err(Rt, uv):
                    pc = X @ Rt[:, :3].T + Rt[:, 3]
                    z = pc[..., 2:3]
                    pr = (pc[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
                          * st.focal + pp)
                    return jnp.sum((pr - uv[:, None, :]) ** 2, -1), pc[..., 2]

                e_i, z_i = err(st.poses[vi], uv_i)
                e_j, z_j = err(st.poses[vj], uv_j)
                return (e_i < g2) & (e_j < g2) & (z_i > 0) & (z_j > 0)

            hit_i = hit_i & reproj_ok(p3d_i)
            hit_j = hit_j & reproj_ok(p3d_j)
            # first-hit priority matches the original scan order:
            # (w=0, vi), (w=0, vj), (w=1, vi), ...
            hit = jnp.stack([hit_i, hit_j], axis=2).reshape(-1, 2 * V)
            p3d = jnp.stack([p3d_i, p3d_j], axis=2).reshape(-1, 2 * V)
            first = jnp.argmax(hit, axis=1)
            trans = jnp.where(jnp.any(hit, axis=1),
                              jnp.take_along_axis(p3d, first[:, None], 1)[:, 0],
                              -1).astype(jnp.int32)

        has_known = (pi >= 0) | (pj >= 0) | (trans >= 0)
        known = jnp.where(pi >= 0, pi, jnp.where(pj >= 0, pj, trans))

        attach = keep & (has_known | (close & confirmed))
        target = jnp.where(has_known, known, ne)
        drop = keep & ~attach & close
        new = keep & ~attach & ~drop

        pos = st.n_points + jnp.cumsum(new.astype(jnp.int32)) - 1
        pos_ok = new & (pos < CAP)
        rows_write = attach | pos_ok
        dest = jnp.where(attach, target, jnp.where(pos_ok, pos, CAP)).astype(jnp.int32)

        xyz2 = st.xyz.at[jnp.where(pos_ok, dest, CAP)].set(xyz_new)
        obs2 = st.obs.at[dest, vi].set(jnp.where(rows_write, fi, -1))
        obs2 = obs2.at[dest, vj].set(jnp.where(rows_write, fj, -1))
        f2p2 = st.feat2point.at[vi, jnp.where(rows_write, fi, F)].set(dest)
        f2p2 = f2p2.at[vj, jnp.where(rows_write, fj, F)].set(dest)

        n2 = st.n_points + jnp.sum(pos_ok.astype(jnp.int32))
        st2 = st._replace(xyz=xyz2, obs=obs2, feat2point=f2p2, n_points=n2)
        return st2, jnp.sum(pos_ok), jnp.sum(attach), jnp.sum(drop)

    # ------------------------------------------------------------------ #
    # on-device bundle adjustment (SfM::adjustCurrentBundle, SfM.cpp:324-330)
    # ------------------------------------------------------------------ #
    def _run_ba(self, st: EngineState, feat_xy, *,
                max_iterations=None, function_tolerance=None):
        cfg = self.cfg
        V, CAP = self.V, self.CAP
        obs = st.obs[:CAP]
        uv = feat_xy[jnp.arange(V)[None, :], jnp.maximum(obs, 0)]          # (CAP, V, 2)
        mask = obs >= 0
        pt_valid = jnp.arange(CAP) < st.n_points
        rvecs = camera.matrix_to_rodrigues_b(st.poses[:, :, :3])
        # unregistered rows carry garbage rotations through the rodrigues
        # round-trip; they are frozen by cam_valid and masked on writeback
        cams = jnp.concatenate([rvecs, st.poses[:, :, 3]], axis=1)
        pp = jnp.array([self.cx, self.cy], jnp.float32)
        prob = BAProblem(
            cams=cams, points=st.xyz[:CAP], focal=st.focal,
            uv=uv - pp[None, None, :], mask=mask,
            cam_valid=st.pose_valid, pt_valid=pt_valid,
        )
        sol, summary = lm_solve(
            prob,
            max_iterations=(cfg.ba_max_iterations if max_iterations is None
                            else max_iterations),
            function_tolerance=(cfg.ba_function_tolerance
                                if function_tolerance is None
                                else function_tolerance),
            initial_lambda=cfg.ba_initial_lambda,
            share_focal=cfg.ba_share_focal,
            refine_pp=False,
        )
        improved = summary.final_cost < summary.initial_cost
        R = camera.rodrigues_to_matrix_b(sol.cams[:, :3])
        Rt = jnp.concatenate([R, sol.cams[:, 3:, None]], axis=2)
        wb = improved & st.pose_valid                                       # (V,)
        poses2 = jnp.where(wb[:, None, None], Rt, st.poses)
        xyz2 = st.xyz.at[:CAP].set(jnp.where(
            (improved & pt_valid)[:, None], sol.points, st.xyz[:CAP]))
        focal2 = jnp.where(improved, sol.focal, st.focal)
        st2 = st._replace(poses=poses2, xyz=xyz2, focal=focal2)
        return st2, (summary.initial_cost, summary.final_cost,
                     summary.iterations.astype(jnp.float32))

    # ------------------------------------------------------------------ #
    # adaptive reprojection gate (MultiCameraPnP.cpp:347-358, Snavely §4.2)
    # ------------------------------------------------------------------ #
    def _adaptive_gate(self, e1, e2, keep):
        cfg = self.cfg
        if not cfg.adaptive_reprojection_filter:
            return keep
        err = jnp.maximum(e1, e2)
        n = jnp.sum(keep)
        srt = jnp.sort(jnp.where(keep, err, _INF))
        qi = jnp.clip((cfg.adaptive_percentile / 100.0)
                      * jnp.maximum(n - 1, 0).astype(jnp.float32),
                      0, err.shape[0] - 1).astype(jnp.int32)
        p = srt[qi]
        thr = jnp.clip(cfg.adaptive_multiplier * p,
                       cfg.adaptive_keep_px, cfg.adaptive_reject_px)
        return keep & jnp.where(n > 0, err <= thr, True)

    # ------------------------------------------------------------------ #
    # the fused solve program
    # ------------------------------------------------------------------ #
    def _build_programs(self):
        cfg = self.cfg
        V, F, M, P, CAP = self.V, self.F, self.M, self.P, self.CAP
        PNP_CAP = self.PNP_CAP

        def build_lookup(match_idx, match_valid, match_dist):
            """Per-pair left->right and right->left match lookups.

            right_of[p, lf] = the right-view feature matched to left
            feature lf of pair p (-1 if none); rdist the match distance.
            Row P and column F are trash. The matcher emits at most one
            match per left feature, so the scatter is conflict-free."""
            rows = jnp.arange(P)[:, None]
            lf = jnp.where(match_valid, match_idx[:, :, 0], F)
            rf = jnp.where(match_valid, match_idx[:, :, 1], F)
            right_of = jnp.full((P + 1, F + 1), -1, jnp.int32)
            right_of = right_of.at[rows, lf].set(
                jnp.where(match_valid, match_idx[:, :, 1], -1))
            rdist = jnp.full((P + 1, F + 1), 1e9, jnp.float32)
            rdist = rdist.at[rows, lf].set(
                jnp.where(match_valid, match_dist, 1e9))
            left_of = jnp.full((P + 1, F + 1), -1, jnp.int32)
            left_of = left_of.at[rows, rf].set(
                jnp.where(match_valid, match_idx[:, :, 0], -1))
            return right_of, rdist, left_of

        self._jit_lookup = jax.jit(build_lookup)

        def homography_counts(key, feat_xy, match_idx, match_valid):
            keys = jax.random.split(key, P)

            def one(k, p):
                uv1, uv2 = self._pair_uv(feat_xy, match_idx, p)
                cnt, _, _ = find_homography_inliers(
                    k, uv1, uv2, match_valid[p],
                    threshold_px=cfg.ransac_threshold_px,
                    hypotheses=cfg.ransac_hypotheses // 4)
                return cnt

            return jax.vmap(one)(keys, jnp.arange(P))

        self._jit_homography = jax.jit(homography_counts)

        from tpusfm.geometry.essential import epipolar_inliers

        def prune_all(key, feat_xy, match_idx, match_valid, focal):
            K = self._K(focal)
            Kinv = self._Kinv(focal)
            keys = jax.random.split(key, P)

            def one(k, p):
                uv1, uv2 = self._pair_uv(feat_xy, match_idx, p)
                m = match_valid[p]
                inl = epipolar_inliers(
                    k, uv1, uv2, m, K, Kinv,
                    threshold_px=cfg.epipolar_prune_threshold_px,
                    hypotheses=cfg.epipolar_prune_hypotheses)
                # only prune pairs with enough matches for the 8-pt solver
                return jnp.where(jnp.sum(m) >= 16, inl & m, m)

            return jax.vmap(one)(keys, jnp.arange(P))

        self._jit_prune = jax.jit(prune_all)
        # The reconstruction is three separately-compiled programs instead
        # of one fused graph (VERDICT r3 #5: the monolithic while+fori
        # program cost ~90 s of XLA optimization cold). The host drives
        # them with purely-async dispatches — zero device->host syncs
        # between programs — so warm throughput is unchanged while the
        # three much smaller graphs compile faster AND in parallel
        # threads (XLA releases the GIL; see run()/compile_parallel()).
        self._jit_baseline = jax.jit(self._baseline)
        self._jit_step = jax.jit(self._step, donate_argnums=(0,))
        self._jit_finish = jax.jit(self._finish, donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    def _baseline(self, feat_xy, match_idx, match_valid,
                  right_of, rdist, left_of, h_counts, key):
        """Baseline ranking + pair search + map seeding + first BA
        (SfM.cpp:215-364). Returns (EngineState, seeded)."""
        cfg = self.cfg
        V, F, P, CAP = self.V, self.F, self.P, self.CAP
        use_horn = cfg.decomposition == EssentialDecomposition.HORN90

        st0 = EngineState(
            xyz=jnp.zeros((CAP + 1, 3), jnp.float32),
            obs=jnp.full((CAP + 1, V), -1, jnp.int32),
            feat2point=jnp.full((V, F + 1), -1, jnp.int32),
            n_points=jnp.zeros((), jnp.int32),
            poses=jnp.zeros((V, 3, 4), jnp.float32),
            pose_valid=jnp.zeros((V,), bool),
            done=jnp.zeros((V,), bool),
            good=jnp.zeros((V,), bool),
            focal=jnp.full((), self.f0, jnp.float32),
            stats=jnp.zeros((V + 1, _STATS_COLS), jnp.float32),
        )

        # ---- baseline ranking (SfM::sortViewsForBaseline, SfM.cpp:333-364)
        counts = jnp.sum(match_valid, axis=1)
        ratio = h_counts / jnp.maximum(counts, 1)
        eligible = counts >= cfg.min_point_count_for_homography
        fallback = counts >= 16
        sortkey = jnp.where(eligible, ratio, jnp.where(fallback, ratio + 10.0, 1e9))
        order = jnp.argsort(sortkey)

        # The loop body only SEARCHES (E-RANSAC + pose gates + triangulation);
        # the winning pair's map seeding (merge + BA) runs ONCE after the
        # loop — on the accepting iteration the loop terminates, so hoisting
        # them is behavior-preserving and removes a whole merge+BA subgraph
        # from the compiled while-body (a large slice of the cold compile).
        M = match_valid.shape[1]
        seed0 = dict(
            p=jnp.zeros((), jnp.int32),
            Rt=jnp.zeros((3, 4), jnp.float32),
            xyz=jnp.zeros((M, 3), jnp.float32),
            keep=jnp.zeros((M,), bool),
            ratio=jnp.zeros(()),
            n_valid=jnp.zeros(()),
        )

        def baseline_body(carry):
            c, sd, seeded = carry
            p = order[c]
            valid = match_valid[p]
            uv1, uv2 = self._pair_uv(feat_xy, match_idx, p)
            # namespace the baseline stream away from the add-view stream
            # (plain fold_in(key, c) would collide with fold_in(key, it)
            # counters for V(V-1)/2 >= add-view iteration indices)
            k1 = jax.random.fold_in(jax.random.fold_in(key, 0), c)
            K = self._K(st0.focal)
            Kinv = self._Kinv(st0.focal)
            res = find_camera_from_match(
                k1, uv1, uv2, valid, K, Kinv,
                threshold_px=cfg.essential_threshold_px,
                hypotheses=self.E_HYP,
                use_horn=use_horn,
                min_front_frac=cfg.cheirality_min_frac,
                max_front_reproj_px=cfg.cheirality_max_reproj_px,
            )
            # pose-inlier gate (SfM.cpp:264-275, POSE_INLIERS_MINIMAL_RATIO)
            pose_ok = res.ok & (res.inlier_ratio >= cfg.pose_inliers_minimal_ratio) \
                & (sortkey[p] < 1e8)
            Rt1 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                                   jnp.zeros((3, 1), jnp.float32)], axis=1)
            xyz, keep, e1, e2 = triangulate_views(
                Rt1, res.Rt, K, Kinv, uv1, uv2, res.inliers & valid,
                max_reprojection_error=cfg.min_reprojection_error,
                iterations=cfg.triangulation_iters,
                eps=cfg.triangulation_eps)
            keep = self._adaptive_gate(e1, e2, keep)
            accept = pose_ok & (jnp.sum(keep) >= 16)
            sd2 = dict(p=p, Rt=res.Rt, xyz=xyz, keep=keep,
                       ratio=res.inlier_ratio,
                       n_valid=jnp.sum(valid).astype(jnp.float32))
            sd_next = _tree_where(accept, sd2, sd)
            return c + 1, sd_next, seeded | accept

        def baseline_cond(carry):
            c, _, seeded = carry
            return (~seeded) & (c < P)

        _, sd, seeded = jax.lax.while_loop(
            baseline_cond, baseline_body,
            (jnp.zeros((), jnp.int32), seed0, jnp.zeros((), bool)))

        def seed_map(st):
            p = sd["p"]
            i = self._pairs[p, 0]
            j = self._pairs[p, 1]
            Rt1 = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                                   jnp.zeros((3, 1), jnp.float32)], axis=1)
            st2 = st._replace(
                poses=st.poses.at[i].set(Rt1).at[j].set(sd["Rt"]),
                pose_valid=st.pose_valid.at[i].set(True).at[j].set(True),
                done=st.done.at[i].set(True).at[j].set(True),
                good=st.good.at[i].set(True).at[j].set(True),
            )
            st2, n_new, n_merged, n_drop = self._merge_points(
                st2, sd["xyz"], sd["keep"], i, j,
                match_idx[p, :, 0], match_idx[p, :, 1],
                right_of, rdist, left_of, feat_xy)
            st2, (ba0, ba1, bait) = self._run_ba(
                st2, feat_xy,
                max_iterations=cfg.ba_incremental_iterations,
                function_tolerance=cfg.ba_incremental_tolerance)
            row = jnp.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
            row = row.at[S_VIEW].set((i * 100 + j).astype(jnp.float32))
            row = row.at[S_N2D3D].set(sd["n_valid"])
            row = row.at[S_RATIO].set(sd["ratio"])
            row = row.at[S_OK].set(1.0)
            row = row.at[S_NEW].set(n_new.astype(jnp.float32))
            row = row.at[S_MERGED].set(n_merged.astype(jnp.float32))
            row = row.at[S_DROPPED].set(n_drop.astype(jnp.float32))
            row = row.at[S_BA0].set(ba0)
            row = row.at[S_BA1].set(ba1)
            row = row.at[S_BAIT].set(bait)
            return st2._replace(stats=st2.stats.at[0].set(row))

        st = jax.lax.cond(seeded, seed_map, lambda s: s, st0)
        return st, seeded

    # ------------------------------------------------------------------ #
    def _step(self, st, it, feat_xy, match_idx, match_valid,
              right_of, rdist, left_of, key):
        """One add-view registration (SfM::addMoreViewsToReconstruction,
        SfM.cpp:366-469). `it` is a traced scalar so V-2 host dispatches
        reuse ONE compiled program; the PRNG stream fold_in(fold_in(key,1),
        it) is identical to the former fused fori_loop body's."""
        cfg = self.cfg
        V, F, P, CAP, PNP_CAP = self.V, self.F, self.P, self.CAP, self.PNP_CAP
        a_all = self._pairs[:, 0]
        b_all = self._pairs[:, 1]

        def all_2d3d(st):
            """point_of_feat (V, F+1) + per-view 2D-3D counts
            (SfM::find2D3DMatches, SfM.cpp:471-528, for every pending view
            at once)."""
            fa = match_idx[:, :, 0]
            fb = match_idx[:, :, 1]
            pa = st.feat2point[a_all[:, None], jnp.clip(fa, 0, F)]
            pb = st.feat2point[b_all[:, None], jnp.clip(fb, 0, F)]
            va = match_valid & (fa >= 0) & (fb >= 0)
            pof = jnp.full((V, F + 1), -1, jnp.int32)
            ok1 = va & st.good[b_all][:, None] & ~st.done[a_all][:, None] & (pb >= 0)
            pof = pof.at[a_all[:, None], jnp.where(ok1, fa, F)].max(
                jnp.where(ok1, pb, -1))
            ok2 = va & st.good[a_all][:, None] & ~st.done[b_all][:, None] & (pa >= 0)
            pof = pof.at[b_all[:, None], jnp.where(ok2, fb, F)].max(
                jnp.where(ok2, pa, -1))
            cnt = jnp.sum(pof[:, :F] >= 0, axis=1)
            return pof, cnt

        pof, cnt = all_2d3d(st)
        cnt = jnp.where(st.done, -1, cnt)
        best = jnp.argmax(cnt).astype(jnp.int32)
        n2d3d = cnt[best]
        st = st._replace(done=st.done.at[best].set(True))   # SfM.cpp:389

        # gather padded 2D-3D correspondences
        hit = (pof[best, :F] >= 0).astype(jnp.float32)
        _, sel = jax.lax.top_k(hit, PNP_CAP)
        mask = hit[sel] > 0
        pts = pof[best, sel]
        X = st.xyz[jnp.clip(pts, 0, CAP)]
        uv = feat_xy[best][sel]
        K = self._K(st.focal)
        Kinv = self._Kinv(st.focal)
        kk = jax.random.fold_in(jax.random.fold_in(key, 1), it)
        res = find_camera_pose_2d3d(
            kk, X, uv, mask, K, Kinv,
            threshold_px=cfg.pnp_threshold_px,
            hypotheses=self.PNP_HYP,
            min_inlier_ratio=cfg.pose_inliers_minimal_ratio)
        n_corr = jnp.sum(mask)
        inl = jnp.sum(res.inliers)
        detR = jnp.linalg.det(res.Rt[:, :3])
        pose_ok = (
            res.ok
            & (n2d3d >= 6)
            # legacy inliers >= points/5 gate (MultiCameraPnP.cpp:287)
            & (inl.astype(jnp.float32) >=
               cfg.min_pnp_inlier_fraction * n_corr.astype(jnp.float32))
            # legacy runaway-translation gate (MultiCameraPnP.cpp:292)
            & (jnp.linalg.norm(res.Rt[:, 3]) <= cfg.max_translation_norm)
            # CheckCoherentRotation (FindCameraMatrices.cpp:113-142)
            & (jnp.abs(detR - 1.0) <= 1e-2)
        )

        # triangulate vs every good view: matches pruned by the Sampson
        # gate against the pose-derived E (replaces the reference's
        # RANSAC re-estimation per pair, SfM.cpp:442-448)
        def tri_one(g):
            a = jnp.minimum(best, g)
            b = jnp.maximum(best, g)
            p = self._pair_row[a, b]
            uv_a, uv_b = self._pair_uv(feat_xy, match_idx, p)
            best_is_a = best < g
            uv_n = jnp.where(best_is_a, uv_a, uv_b)
            uv_g = jnp.where(best_is_a, uv_b, uv_a)
            f_n = jnp.where(best_is_a, match_idx[p, :, 0], match_idx[p, :, 1])
            f_g = jnp.where(best_is_a, match_idx[p, :, 1], match_idx[p, :, 0])
            m = match_valid[p] & (g != best) & st.good[g]
            E = essential_from_poses(res.Rt, st.poses[g])
            x_n = camera.normalize_points(Kinv, uv_n)
            x_g = camera.normalize_points(Kinv, uv_g)
            epi = sampson_error(E, x_n, x_g) < (
                cfg.epipolar_prune_threshold_px / st.focal)
            xyz, keep, e1, e2 = triangulate_views(
                res.Rt, st.poses[g], K, Kinv, uv_n, uv_g, m & epi,
                max_reprojection_error=cfg.min_reprojection_error,
                iterations=cfg.triangulation_iters,
                eps=cfg.triangulation_eps)
            keep = self._adaptive_gate(e1, e2, keep)
            return xyz, keep, f_n, f_g, g

        tri = jax.vmap(tri_one)(jnp.arange(V))

        def merge_slot(carry, slot):
            st_c, tot = carry
            xyz_s, keep_s, fn_s, fg_s, g_s = slot
            st_c, n_new, n_mrg, n_drp = self._merge_points(
                st_c, xyz_s, keep_s & pose_ok, best, g_s, fn_s, fg_s,
                right_of, rdist, left_of, feat_xy)
            return (st_c, tot + jnp.array([n_new, n_mrg, n_drp])), None

        st = st._replace(
            poses=jnp.where(pose_ok, st.poses.at[best].set(res.Rt), st.poses),
            pose_valid=st.pose_valid.at[best].set(pose_ok | st.pose_valid[best]),
            good=st.good.at[best].set(pose_ok | st.good[best]),
        )
        (st, tots), _ = jax.lax.scan(merge_slot, (st, jnp.zeros((3,), jnp.int32)), tri)
        st, (ba0, ba1, bait) = jax.lax.cond(
            pose_ok,
            lambda s: self._run_ba(
                s, feat_xy,
                max_iterations=cfg.ba_incremental_iterations,
                function_tolerance=cfg.ba_incremental_tolerance),
            lambda s: (s, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))), st)
        row = jnp.stack([
            best.astype(jnp.float32), n2d3d.astype(jnp.float32),
            res.inlier_ratio, pose_ok.astype(jnp.float32),
            tots[0].astype(jnp.float32), tots[1].astype(jnp.float32),
            tots[2].astype(jnp.float32), ba0, ba1, bait])
        return st._replace(stats=st.stats.at[1 + it].set(row))

    # ------------------------------------------------------------------ #
    def _finish(self, st, seeded, feat_xy):
        V, CAP = self.V, self.CAP
        # ---- final global polish BA: the per-view BAs above run on a small
        # incremental budget (they only have to keep the map consistent for
        # the next registration); the full-budget solve here is what the
        # exported reconstruction's quality is measured on — same role as
        # the reference's last adjustCurrentBundle call (SfM.cpp:464-466)
        # landing after the final view.
        st, (fb0, fb1, fbit) = jax.lax.cond(
            seeded, lambda s: self._run_ba(s, feat_xy),
            lambda s: (s, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))), st)
        frow = jnp.zeros((_STATS_COLS,), jnp.float32)
        frow = frow.at[S_OK].set(seeded.astype(jnp.float32))
        frow = frow.at[S_BA0].set(fb0).at[S_BA1].set(fb1).at[S_BAIT].set(fbit)
        st = st._replace(stats=st.stats.at[V].set(frow))

        # ---- final mean reprojection error over the live observation grid
        K = self._K(st.focal)
        obs = st.obs[:CAP]
        uv = feat_xy[jnp.arange(V)[None, :], jnp.maximum(obs, 0)]
        w = ((obs >= 0) & st.pose_valid[None, :]
             & (jnp.arange(CAP) < st.n_points)[:, None])

        def proj_view(Rt, uv_v):
            return camera.project_points(Rt, K, st.xyz[:CAP]) - uv_v

        r = jax.vmap(proj_view, in_axes=(0, 1), out_axes=1)(st.poses, uv)   # (CAP, V, 2)
        err = jnp.linalg.norm(r, axis=-1)
        mean_err = jnp.sum(jnp.where(w, err, 0.0)) / jnp.maximum(jnp.sum(w), 1)

        # xyz/obs are returned FULL-SIZE (CAP+1, incl. the trash row):
        # slicing to CAP here would break the donate_argnums=(0,) aliasing
        # of the two largest state buffers (a (CAP,·) output can never
        # reuse a (CAP+1,·) input) — the host slices after the fetch.
        return dict(
            poses=st.poses, pose_valid=st.pose_valid,
            xyz=st.xyz, obs=st.obs, n_points=st.n_points,
            focal=st.focal, stats=st.stats, mean_err=mean_err,
            seeded=seeded,
        )

    # ------------------------------------------------------------------ #
    # parallel ahead-of-time compilation
    # ------------------------------------------------------------------ #
    def precompile_async(self):
        """AOT-compile the six engine programs in parallel threads.

        All shapes are static at construction, so every program can lower
        and compile from ShapeDtypeStructs before any data exists. XLA
        compilation releases the GIL, so the six compiles overlap with
        each other AND with the detector/matcher compiles the first
        reconstruction triggers — cold start becomes max(compile) instead
        of sum(compile) (VERDICT r3 #5).

        OPT-IN (TPUSFM_AOT_PRECOMPILE=1): on the axon-tunneled bench
        device the AOT .lower().compile() path routes through a chipless
        remote compiler that re-initializes per program and serializes —
        measured 7x SLOWER cold than letting the runtime compile the
        same programs at first call. On a directly-attached TPU the
        parallel path is the right one."""
        import os as _os

        if not _os.environ.get("TPUSFM_AOT_PRECOMPILE"):
            return
        if self._compile_futures is not None:
            return
        from concurrent.futures import ThreadPoolExecutor

        sd = jax.ShapeDtypeStruct
        f32, i32 = jnp.float32, jnp.int32
        bl = jnp.bool_
        V, F, M, P, CAP = self.V, self.F, self.M, self.P, self.CAP
        feat_xy = sd((V, F, 2), f32)
        match_idx = sd((P, M, 2), i32)
        match_valid = sd((P, M), bl)
        match_dist = sd((P, M), f32)
        ro = sd((P + 1, F + 1), i32)
        rd = sd((P + 1, F + 1), f32)
        hc = sd((P,), i32)
        key = sd((2,), jnp.uint32)
        focal = sd((), f32)
        st = EngineState(
            xyz=sd((CAP + 1, 3), f32), obs=sd((CAP + 1, V), i32),
            feat2point=sd((V, F + 1), i32), n_points=sd((), i32),
            poses=sd((V, 3, 4), f32), pose_valid=sd((V,), bl),
            done=sd((V,), bl), good=sd((V,), bl), focal=sd((), f32),
            stats=sd((V + 1, _STATS_COLS), f32))
        jobs = {
            "lookup": (self._jit_lookup, (match_idx, match_valid, match_dist)),
            "homography": (self._jit_homography,
                           (key, feat_xy, match_idx, match_valid)),
            "prune": (self._jit_prune,
                      (key, feat_xy, match_idx, match_valid, focal)),
            "baseline": (self._jit_baseline,
                         (feat_xy, match_idx, match_valid, ro, rd, ro, hc, key)),
            "step": (self._jit_step,
                     (st, sd((), i32), feat_xy, match_idx, match_valid,
                      ro, rd, ro, key)),
            "finish": (self._jit_finish, (st, sd((), bl), feat_xy)),
        }
        ex = ThreadPoolExecutor(max_workers=len(jobs))
        self._compile_futures = {
            k: ex.submit(lambda fn=fn, a=a: fn.lower(*a).compile())
            for k, (fn, a) in jobs.items()
        }
        ex.shutdown(wait=False)

    def _program(self, name, fallback):
        """The AOT-compiled executable for `name` (blocking on its compile
        thread), or the plain jit wrapper when precompile wasn't used."""
        if self._compile_futures is None:
            return fallback
        return self._compile_futures[name].result()

    # ------------------------------------------------------------------ #
    # host driver: a handful of async dispatches + ONE batched fetch
    # ------------------------------------------------------------------ #
    def run(self, gray_u8: np.ndarray, extract_fn, match_fn, seed: int = 0):
        """Execute the full reconstruction.

        gray_u8: (V, H, W) uint8 host images (uint8 keeps the H2D transfer
        4x smaller than f32 — it is the only host->device transfer).
        extract_fn: images f32 [0,1] -> Features (the pipeline's detector).
        match_fn: (Features, pairs (P,2)) -> Matches batch.
        """
        import os as _os

        verbose = bool(_os.environ.get("TPUSFM_ENGINE_VERBOSE"))

        def _v(msg):
            if verbose:
                print(f"[engine +{time.perf_counter() - t0:7.1f}s] {msg}",
                      flush=True)

        t0 = time.perf_counter()
        self.precompile_async()   # overlaps with detector/matcher compiles
        key = jax.random.PRNGKey(seed)
        imgs = jax.device_put(gray_u8)
        feats = extract_fn(imgs.astype(jnp.float32) / 255.0)
        jax.block_until_ready(feats.xy)
        t1 = time.perf_counter()
        _v("features done")

        m = match_fn(feats, self._pairs)
        match_idx, match_valid, match_dist = m.idx, m.valid, m.dist
        jax.block_until_ready(match_valid)
        t2 = time.perf_counter()
        _v("matching done")

        if self.cfg.epipolar_prune:
            match_valid = self._program("prune", self._jit_prune)(
                jax.random.fold_in(key, 7), feats.xy, match_idx, match_valid,
                jnp.full((), self.f0, jnp.float32))
            jax.block_until_ready(match_valid)
        t3 = time.perf_counter()
        _v("prune done")

        right_of, rdist, left_of = self._program("lookup", self._jit_lookup)(
            match_idx, match_valid, match_dist)
        h_counts = self._program("homography", self._jit_homography)(
            jax.random.fold_in(key, 11), feats.xy, match_idx, match_valid)
        jax.block_until_ready(h_counts)
        t4 = time.perf_counter()
        _v("ranking done")

        solve_key = jax.random.fold_in(key, 13)
        st, seeded = self._program("baseline", self._jit_baseline)(
            feats.xy, match_idx, match_valid, right_of, rdist, left_of,
            h_counts, solve_key)
        step = self._program("step", self._jit_step)
        for it in range(self.V - 2):
            # purely-async dispatch: `it` rides as a device scalar so all
            # V-2 steps share one executable and nothing syncs the host
            st = step(st, jnp.int32(it), feats.xy, match_idx,
                      match_valid, right_of, rdist, left_of, solve_key)
        out = self._program("finish", self._jit_finish)(st, seeded, feats.xy)
        jax.block_until_ready(out["n_points"])
        t5 = time.perf_counter()
        _v("solve done")

        fetched = jax.device_get(dict(out, feat_xy=feats.xy, feat_valid=feats.valid))
        t6 = time.perf_counter()
        self.timings = {
            "features_s": t1 - t0, "matching_s": t2 - t1, "prune_s": t3 - t2,
            "rank_s": t4 - t3, "solve_s": t5 - t4, "fetch_s": t6 - t5,
            "total_s": t6 - t0,
        }
        return fetched
