"""Distributed sparse (COO) bundle adjustment over a device mesh.

The collection-scale companion of dist/ba.py: the dense-grid distributed
solver shards the (N, V) observation GRID by point rows; this one shards
the COO observation LIST (ba/sparse.py), which is the only layout that
holds at the 5000-image BASELINE configs. Sharding scheme:

  points      — block-sharded over the mesh (each device owns N/D points)
  observations— grouped so every observation lives on its point's shard
  cameras     — replicated; the per-matvec segment reductions into camera
                blocks are psum'd over ICI (one collective per CG matvec,
                plus one per gradient/cost evaluation)

Host-side prep (numpy) permutes points round-robin into contiguous shard
blocks and pads each shard's observation list to a common length with
zero-weight rows, then the ENTIRE matrix-free LM solve runs inside one
shard_map'd jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpusfm import camera
from tpusfm.ba.sparse import SparseBAProblem, lm_solve_sparse


def _group_for_mesh(n_dev: int, n_points: int, cam_idx, pt_idx, uv, w):
    """Permute points round-robin into shard blocks; group + pad obs.

    Returns (order (N,) old->slot permutation, padded per-shard arrays
    flattened back to one leading axis divisible by n_dev)."""
    if n_points % n_dev:
        raise ValueError(f"n_points ({n_points}) must divide the mesh ({n_dev})")
    n_local = n_points // n_dev
    order = np.argsort(np.arange(n_points) % n_dev, kind="stable")  # slot -> old
    inv = np.empty_like(order)
    inv[order] = np.arange(n_points)                                # old -> slot

    new_pt = inv[np.asarray(pt_idx)]
    shard = new_pt // n_local
    o_order = np.argsort(shard, kind="stable")
    counts = np.bincount(shard, minlength=n_dev)
    o_max = int(counts.max()) if len(cam_idx) else 1
    O_pad = o_max * n_dev
    ci = np.zeros(O_pad, np.int32)
    pi = np.zeros(O_pad, np.int32)
    uvp = np.zeros((O_pad, 2), np.float32)
    wp = np.zeros(O_pad, np.float32)
    start = 0
    for d in range(n_dev):
        sel = o_order[start:start + counts[d]]
        start += counts[d]
        base = d * o_max
        ci[base:base + len(sel)] = np.asarray(cam_idx)[sel]
        pi[base:base + len(sel)] = new_pt[sel] - d * n_local  # shard-local
        uvp[base:base + len(sel)] = np.asarray(uv)[sel]
        wp[base:base + len(sel)] = np.asarray(w)[sel]
    return order, inv, ci, pi, uvp, wp


def adjust_bundle_sparse_sharded(
    mesh: Mesh,
    poses_Rt: jnp.ndarray,      # (V, 3, 4)
    cam_valid: jnp.ndarray,     # (V,)
    points: np.ndarray,         # (N, 3), N divisible by mesh size
    cam_idx: np.ndarray,        # (O,)
    pt_idx: np.ndarray,         # (O,)
    uv: np.ndarray,             # (O, 2) raw pixels
    obs_w: np.ndarray,          # (O,)
    K: jnp.ndarray,
    *,
    max_iterations: int = 50,
    function_tolerance: float = 1e-6,
    initial_lambda: float = 1e-3,
    share_focal: bool = True,
    cg_iterations: int = 32,
    huber_delta: float = 0.0,
):
    """Distributed equivalent of ba.sparse.adjust_bundle_sparse."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    N = int(points.shape[0])
    V = poses_Rt.shape[0]
    pp = np.asarray(K[:2, 2])
    order, inv, ci, pi, uvp, wp = _group_for_mesh(
        n_dev, N, cam_idx, pt_idx, np.asarray(uv) - pp[None, :], obs_w)

    rvecs = camera.matrix_to_rodrigues_b(poses_Rt[:, :, :3])
    cams = jnp.concatenate([rvecs, poses_Rt[:, :, 3]], axis=1)

    def local(cams, points_l, ci_l, pi_l, uv_l, w_l, cam_free, focal):
        prob = SparseBAProblem(
            cams=cams, points=points_l, focal=focal,
            cam_idx=ci_l, pt_idx=pi_l, uv=uv_l, w=w_l, cam_free=cam_free)
        sol, summary = lm_solve_sparse(
            prob, max_iterations=max_iterations,
            function_tolerance=function_tolerance,
            initial_lambda=initial_lambda, share_focal=share_focal,
            cg_iterations=cg_iterations, axis_name=axis,
            huber_delta=huber_delta)
        return sol.cams, sol.points, sol.focal, summary

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P(), P()),
    ))
    out_cams, out_pts, out_focal, summary = fn(
        cams, jnp.asarray(np.asarray(points)[order], jnp.float32),
        jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uvp), jnp.asarray(wp),
        cam_valid.astype(jnp.float32), K[0, 0])

    R = camera.rodrigues_to_matrix_b(out_cams[:, :3])
    out_Rt = jnp.concatenate([R, out_cams[:, 3:, None]], axis=2)
    out_Rt = jnp.where(cam_valid[:, None, None], out_Rt, poses_Rt)
    newK = K.at[0, 0].set(out_focal).at[1, 1].set(out_focal)
    return out_Rt, jnp.asarray(out_pts)[jnp.asarray(inv)], newK, summary
