"""Bisection profiler for the feature-detector level kernel (TPU).

Times each sub-stage of features/detect.py::_level_pipeline separately at
the bench operating point (7 x 768x1024, 1280 kp/level, 256-bit BRIEF) to
find where the ~140 ms/level goes.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpusfm.features import detect as D
from tpusfm.io import load_image_directory


def t(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    imgs = load_image_directory("/root/reference/dataset/crazyhorse", 1.0)
    grayf = jnp.asarray(imgs.gray, jnp.float32)
    V, H, W = grayf.shape
    K = 1280
    bits = 256
    thr = 20.0 / 255.0
    print(f"V={V} H={H} W={W} K={K}", flush=True)

    fh = jax.jit(jax.vmap(lambda im: D.fast_harris_maps(im, thr)[0]))
    print(f"fast+harris maps: {t(fh, grayf)*1e3:.1f} ms", flush=True)

    nms = jax.jit(jax.vmap(lambda im: D._nms3(D.fast_harris_maps(im, thr)[0])))
    print(f"  + nms: {t(nms, grayf)*1e3:.1f} ms", flush=True)

    det = jax.jit(jax.vmap(lambda im: D._detect_level(im, thr, K, 24)))
    print(f"  + topk+subpix (detect_level): {t(det, grayf)*1e3:.1f} ms", flush=True)

    blur = D._gaussian_kernel1d(2.0, 4)
    sm = jax.jit(jax.vmap(lambda im: D._sep_conv2d(im, blur)))
    print(f"blur: {t(sm, grayf)*1e3:.1f} ms", flush=True)

    om = jax.jit(jax.vmap(lambda im: D._orientation_maps(D._sep_conv2d(im, blur))))
    print(f"blur+orientation maps: {t(om, grayf)*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.uniform(24, H - 24, (V, K)).astype(np.float32))
    xs = jnp.asarray(rng.uniform(24, W - 24, (V, K)).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-3, 3, (V, K)).astype(np.float32))

    br = jax.jit(jax.vmap(lambda im, y, x, a: D._brief_descriptors(
        D._sep_conv2d(im, blur), y, x, a, bits, "nearest")))
    print(f"blur+brief (nearest): {t(br, grayf, ys, xs, ang)*1e3:.1f} ms", flush=True)

    full = jax.jit(lambda im: D._level_pipeline(
        im, threshold=thr, per_level=K, margin=24, desc_bits=bits,
        blur_sigma=2.0))
    print(f"full level pipeline: {t(full, grayf)*1e3:.1f} ms", flush=True)

    # --- candidate optimizations ---
    # top_k over the full response map vs grid-cell argmax + small top_k
    resp = jax.block_until_ready(nms(grayf))

    topk = jax.jit(lambda r: jax.lax.top_k(r.reshape(V, -1), K))
    print(f"raw top_k over {H*W}: {t(topk, resp)*1e3:.1f} ms", flush=True)

    def grid_topk(r):
        # 8x8 cells -> per-cell argmax -> top_k over cells
        ch, cw = 8, 8
        gh, gw = H // ch, W // cw
        rc = r.reshape(V, gh, ch, gw, cw).transpose(0, 1, 3, 2, 4).reshape(V, gh * gw, ch * cw)
        cell_best = jnp.max(rc, axis=2)
        cell_arg = jnp.argmax(rc, axis=2)
        sc, ci = jax.lax.top_k(cell_best, K)
        flat = cell_arg[jnp.arange(V)[:, None], ci]
        cy = (ci // gw) * ch + flat // cw
        cx = (ci % gw) * cw + flat % cw
        return sc, cy, cx

    gt = jax.jit(grid_topk)
    print(f"grid(8x8) argmax + top_k over {H*W//64}: {t(gt, resp)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
