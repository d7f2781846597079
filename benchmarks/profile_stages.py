"""Stage-isolation profiler for the TPU pipeline (round-3 perf work).

Times each stage of the crazyhorse reconstruction separately on the real
device, including sub-stage breakdowns that the fused engine hides:
  - feature extraction (per pyramid level)
  - matching / prune / rank
  - one lm_solve at engine shapes
  - one find_camera_from_match / triangulate / merge at engine shapes
Prints wall times after an untimed warmup of each program.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

DATASET = "/root/reference/dataset/crazyhorse"


def t(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from tpusfm import SfMConfig
    from tpusfm.io import load_image_directory
    from tpusfm.features.detect import (_level_kernel, _resize_kernel,
                                        _merge_kernel, extract_features)

    cfg = SfMConfig(downscale=1.0, max_features=5120, max_matches=2048,
                    engine_point_capacity=4096)
    imgs = load_image_directory(DATASET, cfg.downscale)
    gray = jax.device_put(imgs.gray)
    grayf = (gray.astype(jnp.float32) / 255.0)
    grayf = jax.block_until_ready(grayf)
    V, H, W = imgs.gray.shape
    print(f"V={V} H={H} W={W}", flush=True)

    # ---- features, per level ----
    per_level = max(cfg.max_features // cfg.pyramid_levels, 256)
    lk = _level_kernel(cfg.fast_threshold / 255.0, per_level, 24, cfg.desc_bits,
                       2.0, "harris", "nearest")
    dt, out0 = t(lk, grayf)
    print(f"level0 (full res): {dt*1e3:.1f} ms", flush=True)
    for lvl in range(1, cfg.pyramid_levels):
        scale = cfg.pyramid_scale ** lvl
        lh, lw = max(int(round(H / scale)), 50), max(int(round(W / scale)), 50)
        rk = _resize_kernel(lh, lw)
        dtr, li = t(rk, grayf)
        dtl, _ = t(lk, li)
        print(f"level{lvl} resize {dtr*1e3:.1f} ms detect {dtl*1e3:.1f} ms", flush=True)
    dt, feats = t(lambda x: extract_features(
        x, max_features=cfg.max_features, desc_bits=cfg.desc_bits,
        pyramid_levels=cfg.pyramid_levels, pyramid_scale=cfg.pyramid_scale,
        fast_threshold=cfg.fast_threshold / 255.0), grayf)
    print(f"extract_features total: {dt*1e3:.1f} ms", flush=True)

    # ---- matching ----
    from tpusfm.pipeline.engine import FusedEngine
    from tpusfm.pipeline.incremental import SfMPipeline
    pipe = SfMPipeline(imgs.gray, cfg, images_rgb=imgs.rgb)
    eng = FusedEngine(cfg, V, H, W, cfg.default_focal, W / 2, H / 2)
    pairs = eng._pairs

    if pipe._use_pallas_matcher:
        dt, m = t(pipe._jit_match_pallas, feats.desc, feats.valid, pairs)
        print(f"pallas match ({eng.P} pairs): {dt*1e3:.1f} ms", flush=True)
    else:
        dt, m = t(pipe._jit_match, feats, pairs)
        print(f"jnp match ({eng.P} pairs): {dt*1e3:.1f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    dt, mv = t(eng._jit_prune, key, feats.xy, m.idx, m.valid,
               jnp.full((), 2500.0, jnp.float32))
    print(f"prune: {dt*1e3:.1f} ms", flush=True)

    dt, lookups = t(eng._jit_lookup, m.idx, mv, m.dist)
    print(f"lookup: {dt*1e3:.1f} ms", flush=True)
    right_of, rdist, left_of = lookups

    dt, hc = t(eng._jit_homography, key, feats.xy, m.idx, mv)
    print(f"homography rank: {dt*1e3:.1f} ms", flush=True)

    # ---- BA alone at engine shapes ----
    from tpusfm.ba.lm import BAProblem, lm_solve
    CAP = cfg.engine_point_capacity
    rng = np.random.default_rng(0)
    Xw = rng.uniform(-1, 1, (CAP, 3)).astype(np.float32)
    Xw[:, 2] += 4.0
    cams = np.tile(np.array([0, 0, 0, 0, 0, 0], np.float32), (V, 1))
    cams[:, 3] = np.linspace(-0.5, 0.5, V)
    f0 = 2500.0

    def project(c, X):
        from tpusfm import camera as cam
        p = cam.rotate_angle_axis(jnp.asarray(c[:3]), jnp.asarray(X)) + c[3:]
        return p[:2] / p[2] * f0

    uv = np.zeros((CAP, V, 2), np.float32)
    for v in range(V):
        P3 = Xw + np.concatenate([cams[v, 3:4], [0, 0]])
        uv[:, v, 0] = P3[:, 0] / P3[:, 2] * f0
        uv[:, v, 1] = P3[:, 1] / P3[:, 2] * f0
    uv += rng.normal(0, 1.0, uv.shape).astype(np.float32)
    mask = rng.uniform(size=(CAP, V)) < 0.4
    prob = BAProblem(
        cams=jnp.asarray(cams), points=jnp.asarray(Xw),
        focal=jnp.full((), f0, jnp.float32), uv=jnp.asarray(uv),
        mask=jnp.asarray(mask), cam_valid=jnp.ones((V,), bool),
        pt_valid=jnp.ones((CAP,), bool))

    for iters in (1, 10, 50):
        solve = jax.jit(lambda p, it=iters: lm_solve(
            p, max_iterations=it, function_tolerance=1e-6,
            initial_lambda=1e-3, share_focal=True, refine_pp=False))
        dt, (sol, summ) = t(solve, prob)
        print(f"lm_solve iters={iters}: {dt*1e3:.1f} ms "
              f"(ran {int(summ.iterations)}) cost {float(summ.initial_cost):.1f}"
              f"->{float(summ.final_cost):.1f}", flush=True)

    # ---- two-view / triangulation / pnp at engine shapes ----
    from tpusfm.geometry.essential import find_camera_from_match
    from tpusfm.geometry.triangulation import triangulate_views
    from tpusfm.geometry.pnp import find_camera_pose_2d3d

    M = cfg.max_matches
    K = jnp.asarray([[f0, 0, W / 2], [0, f0, H / 2], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(K)
    uv1 = jnp.asarray(rng.uniform(0, W, (M, 2)).astype(np.float32))
    uv2 = uv1 + 5.0
    mm = jnp.ones((M,), bool)

    fc = jax.jit(lambda k: find_camera_from_match(
        k, uv1, uv2, mm, K, Kinv, threshold_px=1.0,
        hypotheses=cfg.ransac_hypotheses, use_horn=False,
        min_front_frac=0.75, max_front_reproj_px=100.0))
    dt, res = t(fc, key)
    print(f"find_camera_from_match (B={cfg.ransac_hypotheses}): {dt*1e3:.1f} ms", flush=True)

    Rt1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1).astype(jnp.float32)
    tv = jax.jit(lambda: triangulate_views(
        Rt1, res.Rt, K, Kinv, uv1, uv2, mm,
        max_reprojection_error=10.0, iterations=10, eps=1e-4))
    dt, _ = t(tv)
    print(f"triangulate_views (M={M}): {dt*1e3:.1f} ms", flush=True)

    Xp = jnp.asarray(Xw[:eng.PNP_CAP])
    uvp = jnp.asarray(uv[:eng.PNP_CAP, 0])
    mp = jnp.ones((eng.PNP_CAP,), bool)
    pnp = jax.jit(lambda k: find_camera_pose_2d3d(
        k, Xp, uvp, mp, K, Kinv, threshold_px=10.0,
        hypotheses=cfg.pnp_hypotheses, min_inlier_ratio=0.5))
    dt, _ = t(pnp, key)
    print(f"pnp (B={cfg.pnp_hypotheses}, N={eng.PNP_CAP}): {dt*1e3:.1f} ms", flush=True)

    # ---- full solve (baseline + V-2 steps + finish) ----
    def full_solve(key):
        st, seeded = eng._jit_baseline(feats.xy, m.idx, mv, right_of, rdist,
                                       left_of, hc, key)
        for it in range(eng.V - 2):
            st = eng._jit_step(st, jnp.int32(it), feats.xy, m.idx, mv,
                               right_of, rdist, left_of, key)
        return eng._jit_finish(st, seeded, feats.xy)

    dt, out = t(full_solve, key)
    print(f"solve programs: {dt*1e3:.1f} ms  (n_points={int(out['n_points'])}, "
          f"ba_iters={float(out['stats'][:, 9].sum()):.0f})", flush=True)


if __name__ == "__main__":
    main()
