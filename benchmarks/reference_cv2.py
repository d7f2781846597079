"""Reference-pipeline baseline: a faithful reenactment of the modern
pipeline (SfMToyLib/SfM.cpp:63-95) with the exact OpenCV calls and
parameters the C++ code makes, on this host's CPU.

The reference binary cannot be built here (no Ceres/Boost dev packages),
so each stage is reproduced 1:1:

  - setImagesDirectory: dir scan + imread + downscale   (SfM.cpp:98-138)
  - ORB 5000 keypoints/image                            (SfM2DFeatureUtilities.cpp:39)
  - all-pairs BFMatcher Hamming kNN k=2 + 0.8 ratio, fanned out over a
    thread pool exactly like the reference's std::thread fan-out
    (SfM.cpp:165-211; BFMatcher releases the GIL)
  - sortViewsForBaseline: findHomography RANSAC thr=10 inlier ratio per
    pair with >= 100 matches                            (SfM.cpp:333-364)
  - findBaselineTriangulation: findEssentialMat RANSAC 0.999/1.0 +
    recoverPose + inlier-ratio >= 0.5 gate + triangulatePoints with the
    dual <= 10 px reprojection gate                     (SfM.cpp:215-321)
  - addMoreViewsToReconstruction: find2D3DMatches scan over good views'
    matches x cloud provenance (SfM.cpp:471-528), solvePnPRansac with
    real 2D-3D correspondences (100 iters, thr 10, conf 0.99,
    SfMStereoUtilities.cpp:216-231), per-good-view E-matrix re-pruning +
    triangulation (SfM.cpp:413-461), mergeNewPointCloud with the 3D
    distance < 0.01 + feature distance < 20 rules       (SfM.cpp:530-629)
  - adjustCurrentBundle after the baseline and every added view: global
    scipy least_squares over ALL cameras + points + shared focal with the
    standard sparse-Jacobian BA structure — the closest scipy analog of
    Ceres DENSE_SCHUR (SfMBundleAdjustmentUtils.cpp:99-222), run to
    convergence (ftol 1e-6) under the reference's 10 s wall cap per call
    (SfMBundleAdjustmentUtils.cpp:172-176) so the baseline's QUALITY is a
    genuine Ceres stand-in, not a deliberately-crippled one.

Timing is cached to benchmarks/baseline_cache.json so the TPU bench run
doesn't re-measure the CPU baseline every time.
"""
from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_CACHE = os.path.join(os.path.dirname(__file__), "baseline_cache.json")

MERGE_POINT_DIST = 0.01       # MERGE_CLOUD_POINT_MIN_MATCH_DISTANCE (SfM.cpp:50)
MERGE_FEAT_DIST = 20.0        # MERGE_CLOUD_FEATURE_MIN_MATCH_DISTANCE (SfM.cpp:51)
MIN_H_COUNT = 100             # MIN_POINT_COUNT_FOR_HOMOGRAPHY (SfM.cpp:52)
POSE_INLIER_RATIO = 0.5       # POSE_INLIERS_MINIMAL_RATIO (SfMCommon.h:53)
REPROJ_GATE = 10.0            # MIN_REPROJECTION_ERROR (SfMStereoUtilities.cpp:42)


def _reenact(image_dir: str, downscale: float, n_features: int) -> dict:
    import cv2

    # Deterministic RANSAC: unseeded cv2 runs flip between 6- and
    # 7-camera reconstructions of crazyhorse (~86-132 px) run to run.
    # NOTE the ~100 px landing zone is NOT a solver-budget artifact: with
    # the analytic-Jacobian BA run to ftol=1e-6 convergence under the
    # reference's 10 s/call cap, two independent runs still landed at
    # 86.8 px (7 cams) and 131.9 px (6 cams). The reference pipeline has
    # no robust loss (SfMBundleAdjustmentUtils.cpp:58-97) and merges
    # tracks on descriptor distance alone without a reprojection check
    # (SfM.cpp:566-587), so wrong merges drag the unrobust global BA —
    # that is the algorithm's quality ceiling at the hardcoded f=2500,
    # not a crippled stand-in.
    cv2.setRNGSeed(7)

    t_start = time.perf_counter()
    stage = {}

    # --- load (SfM.cpp:98-138) ---
    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    imgs = []
    for p in paths:
        im = cv2.imread(p)
        if downscale != 1.0:
            im = cv2.resize(im, None, fx=1.0 / downscale, fy=1.0 / downscale)
        imgs.append(im)
    V = len(imgs)
    h, w = imgs[0].shape[:2]
    f0 = 2500.0 / downscale
    K = np.array([[f0, 0, w / 2], [0, f0, h / 2], [0, 0, 1]], np.float64)

    # --- features (SfM.cpp:141-154) ---
    t0 = time.perf_counter()
    orb = cv2.ORB_create(n_features)
    grays = [cv2.cvtColor(im, cv2.COLOR_BGR2GRAY) for im in imgs]
    kd = [orb.detectAndCompute(g, None) for g in grays]
    kps = [np.float32([k.pt for k in ks]) for ks, _ in kd]
    descs = [d for _, d in kd]
    stage["features_s"] = time.perf_counter() - t0

    # --- all-pairs matching, threaded like SfM.cpp:165-211 ---
    t0 = time.perf_counter()
    pairs = [(i, j) for i in range(V) for j in range(i + 1, V)]

    def match_one(pair):
        i, j = pair
        bf = cv2.BFMatcher(cv2.NORM_HAMMING)
        knn = bf.knnMatch(descs[i], descs[j], k=2)
        return [(m.queryIdx, m.trainIdx, m.distance)
                for p in knn if len(p) == 2
                for m in [p[0]] if m.distance < 0.8 * p[1].distance]

    workers = max((os.cpu_count() or 2) - 1, 1)
    with ThreadPoolExecutor(workers) as ex:
        matched = list(ex.map(match_one, pairs))
    matches = {p: np.array(m if m else np.zeros((0, 3))).reshape(-1, 3)
               for p, m in zip(pairs, matched)}
    stage["matching_s"] = time.perf_counter() - t0

    def pair_pts(i, j):
        a, b = (i, j) if i < j else (j, i)
        m = matches[(a, b)]
        qi, ti = m[:, 0].astype(int), m[:, 1].astype(int)
        if (a, b) != (i, j):
            qi, ti = ti, qi
        return kps[i][qi], kps[j][ti], m

    # --- sortViewsForBaseline (SfM.cpp:333-364) ---
    t0 = time.perf_counter()
    ranked = []
    for (i, j), m in matches.items():
        if len(m) < MIN_H_COUNT:
            continue
        p1, p2, _ = pair_pts(i, j)
        _, mask = cv2.findHomography(p1, p2, cv2.RANSAC, 10.0)
        n_inl = int(mask.sum()) if mask is not None else len(m)
        ranked.append((n_inl / len(m), (i, j)))
    ranked.sort()
    stage["homography_s"] = time.perf_counter() - t0

    # --- reconstruction state ---
    cloud_xyz = []        # list of (3,) points
    cloud_obs = []        # list of dict view -> feature idx
    poses = {v: None for v in range(V)}
    done, good = set(), set()

    def triangulate_pair(i, j, Pi, Pj, qi, ti, p1, p2):
        """cv2.triangulatePoints + dual reprojection gate (SfM.cpp /
        SfMStereoUtilities.cpp:120-206). Returns list of (xyz, {i:qi, j:ti})."""
        if len(p1) < 8:
            return []
        Xh = cv2.triangulatePoints(K @ Pi, K @ Pj, p1.T.astype(np.float64),
                                   p2.T.astype(np.float64))
        X = (Xh[:3] / np.where(np.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])).T
        out = []
        for Pv, pv in ((Pi, p1), (Pj, p2)):
            pc = X @ Pv[:, :3].T + Pv[:, 3]
            uv = (pc[:, :2] / np.maximum(pc[:, 2:3], 1e-9)) * f0 + np.array([w / 2, h / 2])
            out.append((np.linalg.norm(uv - pv, axis=1), pc[:, 2]))
        (e1, z1), (e2, z2) = out
        keep = (e1 <= REPROJ_GATE) & (e2 <= REPROJ_GATE) & (z1 > 0) & (z2 > 0)
        return [(X[k], {i: int(qi[k]), j: int(ti[k])}) for k in np.nonzero(keep)[0]]

    def merge_new_points(new_pts):
        """SfM::mergeNewPointCloud (SfM.cpp:530-629)."""
        n_new = n_merged = 0
        arr = np.array(cloud_xyz).reshape(-1, 3)
        n_existing = len(arr)  # like the reference, only scan pre-existing points
        for X, obs in new_pts:
            if n_existing:
                d = np.linalg.norm(arr - X, axis=1)
                near = np.nonzero(d < MERGE_POINT_DIST)[0]
            else:
                near = []
            merged = False
            found_close = len(near) > 0
            for ci in near:
                for nv, nf in obs.items():
                    for ev, ef in list(cloud_obs[ci].items()):
                        lv, lf, rv, rf = (nv, nf, ev, ef) if nv < ev else (ev, ef, nv, nf)
                        if lv == rv:
                            continue
                        m = matches[(lv, rv)]
                        hit = (m[:, 0] == lf) & (m[:, 1] == rf) & (m[:, 2] < MERGE_FEAT_DIST)
                        if hit.any():
                            cloud_obs[ci][nv] = nf
                            merged = True
                if merged:
                    n_merged += 1
                    break
            if not merged and not found_close:
                cloud_xyz.append(X)
                cloud_obs.append(dict(obs))
                n_new += 1
        return n_new, n_merged

    def adjust_bundle():
        """Global BA over all registered cameras + points + shared focal
        (SfMBundleAdjustmentUtils.cpp:99-222), scipy sparse-Jacobian trf."""
        from scipy.optimize import least_squares

        cams = sorted(good)
        if not cams or not cloud_xyz:
            return
        cam_of = {v: c for c, v in enumerate(cams)}
        obs_list = []
        for n, obs in enumerate(cloud_obs):
            for v, fidx in obs.items():
                if v in cam_of:
                    obs_list.append((n, cam_of[v], kps[v][fidx]))
        if len(obs_list) < 8:
            return
        nC, nP = len(cams), len(cloud_xyz)
        import cv2
        x0 = np.zeros(6 * nC + 3 * nP + 1)
        for v, c in cam_of.items():
            rv, _ = cv2.Rodrigues(poses[v][:, :3])
            x0[6 * c: 6 * c + 3] = rv.ravel()
            x0[6 * c + 3: 6 * c + 6] = poses[v][:, 3]
        x0[6 * nC: 6 * nC + 3 * nP] = np.array(cloud_xyz).ravel()
        x0[-1] = f0
        pidx = np.array([o[0] for o in obs_list])
        cidx = np.array([o[1] for o in obs_list])
        uv = np.array([o[2] for o in obs_list]) - np.array([w / 2, h / 2])

        def resid(x):
            r = np.empty((len(obs_list), 2))
            pts = x[6 * nC: 6 * nC + 3 * nP].reshape(-1, 3)
            foc = x[-1]
            for c in range(nC):
                sel = cidx == c
                Rm, _ = cv2.Rodrigues(x[6 * c: 6 * c + 3])
                pc = pts[pidx[sel]] @ Rm.T + x[6 * c + 3: 6 * c + 6]
                r[sel] = (pc[:, :2] / np.maximum(pc[:, 2:3], 1e-9)) * foc - uv[sel]
            return r.ravel()

        def jac(x):
            """Analytic sparse Jacobian — the Ceres parity point: Ceres
            autodiffs the residual (SfMBundleAdjustmentUtils.cpp:92), so
            every LM iteration costs one residual + one Jacobian sweep.
            scipy's jac_sparsity finite differences need ~a dozen residual
            sweeps per iteration, which starved the 10 s wall cap and left
            the 'converged-budget' baseline at >100 px."""
            from scipy.sparse import csr_matrix

            pts = x[6 * nC: 6 * nC + 3 * nP].reshape(-1, 3)
            foc = x[-1]
            nO = len(obs_list)
            rows_ = np.broadcast_to(np.arange(2 * nO).reshape(nO, 2, 1),
                                    (nO, 2, 10))
            data = np.zeros((nO, 2, 10))
            cols = np.zeros((nO, 2, 10), int)
            for c in range(nC):
                sel = np.nonzero(cidx == c)[0]
                rvec = x[6 * c: 6 * c + 3]
                Rm, dRdr = cv2.Rodrigues(rvec)   # dRdr: (3, 9) dR/drvec
                X = pts[pidx[sel]]
                pc = X @ Rm.T + x[6 * c + 3: 6 * c + 6]
                z = np.maximum(pc[:, 2], 1e-9)
                px, py = pc[:, 0], pc[:, 1]
                # d r / d pc  (2, 3) per obs
                drdpc = np.zeros((len(sel), 2, 3))
                drdpc[:, 0, 0] = foc / z
                drdpc[:, 0, 2] = -foc * px / z ** 2
                drdpc[:, 1, 1] = foc / z
                drdpc[:, 1, 2] = -foc * py / z ** 2
                # d pc / d rvec: (3, 3) per obs from the (3, 9) Rodrigues jac
                # cv2 convention: dRdr[k] = dR.flatten-by-rows/drvec_k
                dRdr9 = dRdr.reshape(3, 3, 3)    # (k, i, j)
                dpcdr = np.einsum("kij,oj->oik", dRdr9, X)  # (o, 3, 3)
                data[sel, :, 0:3] = drdpc @ dpcdr           # d r/d rvec
                data[sel, :, 3:6] = drdpc                   # d r/d t
                data[sel, :, 6:9] = drdpc @ Rm              # d r/d X
                data[sel, :, 9] = np.stack([px / z, py / z], 1)  # d r/d f
                cols[sel, :, 0:3] = 6 * c + np.arange(3)
                cols[sel, :, 3:6] = 6 * c + 3 + np.arange(3)
                cols[sel, :, 6:9] = (6 * nC + 3 * pidx[sel])[:, None, None] \
                    + np.arange(3)
                cols[sel, :, 9] = len(x) - 1
            return csr_matrix((data.ravel(), (rows_.ravel(), cols.ravel())),
                              shape=(2 * nO, len(x)))

        # Ceres-equivalent budget (SfMBundleAdjustmentUtils.cpp:172-176):
        # analytic-Jacobian TRF to ftol=1e-6, <=500 iters, under the
        # reference's 10 s wall cap (run in warm-started slices; scipy has
        # no wall-clock option).
        t_ba = time.perf_counter()
        x = x0
        while True:
            sol = least_squares(resid, x, jac=jac, method="trf",
                                x_scale="jac", ftol=1e-6, max_nfev=50)
            x = sol.x
            if sol.status != 0:          # converged (ftol/xtol/gtol), not cap
                break
            if time.perf_counter() - t_ba > 10.0:
                break
        for v, c in cam_of.items():
            Rm, _ = cv2.Rodrigues(x[6 * c: 6 * c + 3])
            poses[v] = np.hstack([Rm, x[6 * c + 3: 6 * c + 6, None]])
        pts = x[6 * nC: 6 * nC + 3 * nP].reshape(-1, 3)
        for n in range(nP):
            cloud_xyz[n] = pts[n]

    # --- findBaselineTriangulation (SfM.cpp:215-321) ---
    t0 = time.perf_counter()
    for _, (i, j) in ranked:
        p1, p2, m = pair_pts(i, j)
        E, mask = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 1.0)
        if E is None or E.shape != (3, 3):
            continue
        n_inl, R, t, mask = cv2.recoverPose(E, p1, p2, K, mask=mask)
        if n_inl / max(len(m), 1) < POSE_INLIER_RATIO:
            continue
        sel = mask.ravel() > 0
        Pi = np.hstack([np.eye(3), np.zeros((3, 1))])
        Pj = np.hstack([R, t])
        pts = triangulate_pair(i, j, Pi, Pj, m[sel, 0].astype(int),
                               m[sel, 1].astype(int), p1[sel], p2[sel])
        if len(pts) < 16:
            continue
        poses[i], poses[j] = Pi, Pj
        done |= {i, j}
        good |= {i, j}
        merge_new_points(pts)
        adjust_bundle()
        break
    stage["baseline_s"] = time.perf_counter() - t0
    if not good:
        raise RuntimeError("baseline reenactment failed to seed")

    # --- addMoreViewsToReconstruction (SfM.cpp:366-469) ---
    t0 = time.perf_counter()
    while len(done) < V:
        # find2D3DMatches for every pending view (SfM.cpp:471-528)
        best_v, best_corr = None, []
        for v in range(V):
            if v in done:
                continue
            pt_of_feat = {}
            for g in good:
                a, b = (v, g) if v < g else (g, v)
                m = matches[(a, b)]
                fv = (m[:, 0] if v < g else m[:, 1]).astype(int)
                fg = (m[:, 1] if v < g else m[:, 0]).astype(int)
                claim = {}
                for n, obs in enumerate(cloud_obs):
                    if g in obs:
                        claim[obs[g]] = n
                for q, tr in zip(fv, fg):
                    if tr in claim:
                        pt_of_feat[q] = claim[tr]
            corr = [(kps[v][q], cloud_xyz[n]) for q, n in pt_of_feat.items()]
            if len(corr) > len(best_corr):
                best_v, best_corr = v, corr
        if best_v is None:
            break
        done.add(best_v)
        if len(best_corr) < 6:
            continue
        img_pts = np.array([c[0] for c in best_corr], np.float64)
        obj_pts = np.array([c[1] for c in best_corr], np.float64)
        ok, rvec, tvec, inl = cv2.solvePnPRansac(
            obj_pts, img_pts, K, None, iterationsCount=100,
            reprojectionError=10.0, confidence=0.99)
        if not ok or inl is None or len(inl) / len(best_corr) < POSE_INLIER_RATIO:
            continue
        Rm, _ = cv2.Rodrigues(rvec)
        poses[best_v] = np.hstack([Rm, tvec.reshape(3, 1)])
        # re-prune + triangulate vs every good view (SfM.cpp:413-461)
        new_pts = []
        for g in sorted(good):
            p1, p2, m = pair_pts(best_v, g)
            if len(m) < 8:
                continue
            E, mask = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 1.0)
            if E is None or E.shape != (3, 3) or mask is None:
                continue
            sel = mask.ravel() > 0
            qi = (m[:, 0] if best_v < g else m[:, 1]).astype(int)[sel]
            ti = (m[:, 1] if best_v < g else m[:, 0]).astype(int)[sel]
            new_pts += triangulate_pair(best_v, g, poses[best_v], poses[g],
                                        qi, ti, p1[sel], p2[sel])
        good.add(best_v)
        merge_new_points(new_pts)
        adjust_bundle()
    stage["add_views_s"] = time.perf_counter() - t0

    total = time.perf_counter() - t_start
    # final mean reprojection error for quality cross-checks
    errs = []
    for n, obs in enumerate(cloud_obs):
        for v, fidx in obs.items():
            if poses[v] is None:
                continue
            pc = cloud_xyz[n] @ poses[v][:, :3].T + poses[v][:, 3]
            if pc[2] <= 0:
                continue
            uv = (pc[:2] / pc[2]) * f0 + np.array([w / 2, h / 2])
            errs.append(np.linalg.norm(uv - kps[v][fidx]))
    return {
        "total_s": total,
        **{k: round(v, 3) for k, v in stage.items()},
        "frames": V,
        "frames_per_s": V / total,
        "n_points": len(cloud_xyz),
        "n_cameras": sum(p is not None for p in poses.values()),
        # mean is outlier-dominated: neither the reference's Ceres cost
        # (SfMBundleAdjustmentUtils.cpp:58-97) nor this reenactment uses a
        # robust loss, and mergeNewPointCloud chains descriptor-confirmed
        # observations without a reprojection check (SfM.cpp:566-587) —
        # report the median alongside for an honest quality anchor
        "mean_reproj_px": float(np.mean(errs)) if errs else float("nan"),
        "median_reproj_px": float(np.median(errs)) if errs else float("nan"),
        "n_features": n_features,
    }


def measure_reference_baseline(image_dir: str, downscale: float = 1.0,
                               n_features: int = 5000,
                               force: bool = False) -> dict:
    # v4: analytic-Jacobian converged BA (Ceres autodiff parity), seeded —
    # v3's analytic run was unseeded; v2's finite-difference "converged
    # budget" starved the 10 s wall cap and produced a 145 px / 6-camera
    # baseline; v1 was the crippled ftol=1e-3/max_nfev=30 run
    key = f"{os.path.abspath(image_dir)}@{downscale}@orb{n_features}@bav4"
    if os.path.exists(_CACHE) and not force:
        cache = json.load(open(_CACHE))
        if key in cache:
            return cache[key]
    result = _reenact(image_dir, downscale, n_features)
    cache = json.load(open(_CACHE)) if os.path.exists(_CACHE) else {}
    cache[key] = result
    json.dump(cache, open(_CACHE, "w"), indent=1)
    return result


if __name__ == "__main__":
    import sys

    d = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/dataset/crazyhorse"
    print(json.dumps(measure_reference_baseline(d, force=True), indent=2))
