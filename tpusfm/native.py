"""ctypes bindings to the native C++ runtime (csrc/libtpusfm_native.so).

The reference's runtime is entirely native C++; this module is the
bridge to our C++ equivalents — threaded image decode (csrc/imageio.cc,
role of SfM.cpp:98-138) and the track-graph bookkeeping hot path
(csrc/trackgraph.cc, roles of SfM.cpp:471-528 and :530-629). Builds on
demand with make; every caller has a pure-Python fallback, so the
framework runs (slower) without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO = os.path.join(_CSRC, "libtpusfm_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.tpusfm_load_images.restype = ctypes.c_int
    lib.tpusfm_load_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.tpusfm_image_size.restype = ctypes.c_int
    lib.tpusfm_image_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tpusfm_insert_points.restype = ctypes.c_int
    lib.tpusfm_insert_points.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.tpusfm_insert_points_v2.restype = ctypes.c_int
    lib.tpusfm_insert_points_v2.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_void_p,
    ]
    lib.tpusfm_find_2d3d.restype = ctypes.c_int
    lib.tpusfm_find_2d3d.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def load_images(paths, target_h: int, target_w: int, n_threads: int = 0):
    """Threaded native decode -> (rgb (N,H,W,3) u8, gray (N,H,W) f32).

    Returns None if the native library is unavailable or any decode fails.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    rgb = np.zeros((n, target_h, target_w, 3), np.uint8)
    gray = np.zeros((n, target_h, target_w), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.tpusfm_load_images(arr, n, target_h, target_w, _ptr(rgb), _ptr(gray), n_threads)
    if ok != n:
        return None
    return rgb, gray


def image_size(path: str):
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if not lib.tpusfm_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        return None
    return h.value, w.value


def insert_points(xyz: np.ndarray, obs: np.ndarray, feat2point: np.ndarray,
                  n_points: int, vi: int, vj: int, new_xyz: np.ndarray,
                  fi: np.ndarray, fj: np.ndarray):
    """Native mergeNewPointCloud. Mutates xyz/obs/feat2point in place.

    Returns (new_n_points, appended, merged) or None when unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    cap, V = obs.shape
    F = feat2point.shape[1]
    stats = np.zeros(2, np.int32)
    nxyz = np.ascontiguousarray(new_xyz, np.float32)
    fi = np.ascontiguousarray(fi, np.int32)
    fj = np.ascontiguousarray(fj, np.int32)
    n2 = lib.tpusfm_insert_points(
        _ptr(xyz), _ptr(obs), _ptr(feat2point), cap, V, F, n_points,
        vi, vj, _ptr(nxyz), _ptr(fi), _ptr(fj), len(fi), _ptr(stats))
    return n2, int(stats[0]), int(stats[1])


def insert_points_v2(xyz: np.ndarray, obs: np.ndarray, feat2point: np.ndarray,
                     n_points: int, vi: int, vj: int, new_xyz: np.ndarray,
                     fi: np.ndarray, fj: np.ndarray, pair_row: np.ndarray,
                     right_of: np.ndarray, rdist: np.ndarray,
                     left_of: np.ndarray, merge_dist: float, feat_dist: float,
                     strengthen_dist: float, strengthen: bool,
                     poses: np.ndarray | None = None,
                     feat_xy: np.ndarray | None = None,
                     focal: float = 0.0, cx: float = 0.0, cy: float = 0.0,
                     reproj_gate: float = 0.0):
    """Native full mergeNewPointCloud (SfM.cpp:530-629): exact + transitive
    feature claims, 3D-distance merge with feature confirmation, sequential
    like the reference. Mutates xyz/obs/feat2point in place.

    A transitive (strengthening) claim is additionally confirmed by
    reprojection of the claimed map point into both originating views
    within reproj_gate pixels when poses/feat_xy are given.

    Returns (new_n_points, appended, merged, dropped) or None.
    """
    lib = _load()
    if lib is None:
        return None
    cap, V = obs.shape
    F = feat2point.shape[1]
    stats = np.zeros(3, np.int32)
    nxyz = np.ascontiguousarray(new_xyz, np.float32)
    fi = np.ascontiguousarray(fi, np.int32)
    fj = np.ascontiguousarray(fj, np.int32)
    pr = np.ascontiguousarray(pair_row, np.int32)
    ro = np.ascontiguousarray(right_of, np.int32)
    rd = np.ascontiguousarray(rdist, np.float32)
    lo = np.ascontiguousarray(left_of, np.int32)
    if poses is not None and feat_xy is not None:
        ps = np.ascontiguousarray(poses, np.float32)
        fx = np.ascontiguousarray(feat_xy, np.float32)
        ps_p, fx_p = _ptr(ps), _ptr(fx)
    else:
        ps_p = fx_p = None
        reproj_gate = 0.0
    n2 = lib.tpusfm_insert_points_v2(
        _ptr(xyz), _ptr(obs), _ptr(feat2point), cap, V, F, n_points,
        vi, vj, _ptr(nxyz), _ptr(fi), _ptr(fj), len(fi),
        _ptr(pr), _ptr(ro), _ptr(rd), _ptr(lo),
        merge_dist, feat_dist, strengthen_dist, int(strengthen),
        ps_p, fx_p, focal, cx, cy, reproj_gate, _ptr(stats))
    return n2, int(stats[0]), int(stats[1]), int(stats[2])


def find_2d3d(feat2point: np.ndarray, view: int, good_views, pair_row: np.ndarray,
              match_idx: np.ndarray, match_valid: np.ndarray):
    """Native find2D3DMatches. Returns (feats, points) int32 arrays or None."""
    lib = _load()
    if lib is None:
        return None
    V, F = feat2point.shape
    M = match_idx.shape[1]
    gv = np.ascontiguousarray(sorted(good_views), np.int32)
    pof = np.full(F, -1, np.int32)
    out_f = np.zeros(F, np.int32)
    out_p = np.zeros(F, np.int32)
    mi = np.ascontiguousarray(match_idx, np.int32)
    mv = np.ascontiguousarray(match_valid, np.uint8)
    cnt = lib.tpusfm_find_2d3d(
        _ptr(feat2point), V, F, view, _ptr(gv), len(gv), _ptr(pair_row),
        _ptr(mi), _ptr(mv), M, _ptr(pof), _ptr(out_f), _ptr(out_p))
    return out_f[:cnt].copy(), out_p[:cnt].copy()
